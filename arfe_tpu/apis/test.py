"""Dataset evaluation API.

TPU-native counterpart of ref: mmdet/apis/test.py:37-209. Detections stay on
device as fixed-size arrays until the final host transfer; multi-chip eval
shards images over the data mesh (no pickle round-trips — SURVEY.md §2.4).
"""
from __future__ import annotations

import time

import numpy as np

from ..core.bbox.transforms import bbox2result



def encode_mask_results(mask_results):
    """Encode per-class binary mask lists to uncompressed COCO RLE
    (ref: mmdet/apis/test.py encode_mask_results via pycocotools;
    here self-contained, see core/mask/rle.py). Accepts the (bbox, segm)
    tuples produced by single/multi_device_test and returns the same
    structure with each mask replaced by an RLE dict."""
    from ..core.mask.rle import mask_to_rle
    encoded = []
    for res in mask_results:
        if not isinstance(res, tuple):
            encoded.append(res)
            continue
        det, seg = res
        encoded.append((det, [[m if isinstance(m, dict)
                               else mask_to_rle(np.asarray(m))
                               for m in cls_masks] for cls_masks in seg]))
    return encoded


def single_device_test(model, params, data_loader, show_progress=True):
    """(ref: apis/test.py:37-60 single_gpu_test). Returns the reference's
    result format: per image, list of per-class (n, 5) arrays."""
    import jax
    import jax.numpy as jnp

    jitted = jax.jit(lambda p, img, shapes, sf: model.simple_test(
        p, img, shapes, sf, rescale=True))

    def run_aug(p, batch):
        """TTA batch: drive model.aug_test with per-aug arrays. Flip flags
        are static per aug (stable MultiScaleFlipAug order), so the jit
        caches one program per aug configuration."""
        augs = batch['augs']
        flips = tuple(bool(a['img_metas'][0].get('flip', False))
                      for a in augs)
        shapes = tuple(a['img'].shape for a in augs)

        key = (flips, shapes)
        if key not in _aug_cache:
            def fn(p, imgs, shps, sfs):
                return model.aug_test(p, list(imgs), list(shps), list(sfs),
                                      list(flips), rescale=True)
            _aug_cache[key] = jax.jit(fn)
        return _aug_cache[key](
            p, tuple(jnp.asarray(a['img']) for a in augs),
            tuple(jnp.asarray(a['img_shape']) for a in augs),
            tuple(jnp.asarray(a['scale_factor']) for a in augs))

    _aug_cache = {}
    num_classes = (model.bbox_head.num_classes if hasattr(model, 'bbox_head')
                   else model.roi_head.bbox_head.num_classes)
    results = []
    t0 = time.time()
    n_done = 0
    for batch in data_loader:
        aug_mode = 'augs' in batch
        if aug_mode:
            out = run_aug(params, batch)
            batch = dict(batch['augs'][0], img_metas=batch['img_metas'])
        else:
            out = jitted(params, jnp.asarray(batch['img']),
                         jnp.asarray(batch['img_shape']),
                         jnp.asarray(batch['scale_factor']))
        dets, labels, valid = (np.asarray(out[0]), np.asarray(out[1]),
                               np.asarray(out[2]))
        masks = np.asarray(out[3]) if len(out) > 3 else None
        for i in range(dets.shape[0]):
            d = np.where(valid[i][:, None], dets[i], -np.ones_like(dets[i]))
            bbox_res = bbox2result(d, labels[i], num_classes)
            if masks is None:
                results.append(bbox_res)
            else:
                from ..core.mask import paste_masks_np
                meta = batch['img_metas'][i]
                oh, ow = meta['ori_shape'][:2]
                # aug_test and HTC already emit probabilities; plain
                # simple_test returns logits
                already_probs = aug_mode or getattr(
                    getattr(model, 'roi_head', None), 'with_mask_probs',
                    False)
                prob = masks[i] if already_probs else \
                    1.0 / (1.0 + np.exp(-masks[i]))
                pasted = paste_masks_np(prob, d[:, :4], oh, ow)
                keep = d[:, 4] > -1
                segm = [[pasted[j] for j in
                         np.where(keep & (labels[i] == c))[0]]
                        for c in range(num_classes)]
                results.append((bbox_res, segm))
        n_done += dets.shape[0]
        if show_progress:
            rate = n_done / max(time.time() - t0, 1e-6)
            print(f'\r{n_done} imgs, {rate:.1f} img/s', end='', flush=True)
    if show_progress:
        print()
    return results


def multi_device_test(model, params, data_loader, mesh):
    """Data-parallel eval over a mesh: images sharded on 'data', fixed-size
    detection arrays gathered by XLA (ref eval distribution replaced —
    SURVEY.md §2.4)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P('data'))

    @jax.jit
    def step(p, img, shapes, sf):
        img = jax.lax.with_sharding_constraint(img, data)
        return model.simple_test(p, img, shapes, sf, rescale=True)

    num_classes = (model.bbox_head.num_classes if hasattr(model, 'bbox_head')
                   else model.roi_head.bbox_head.num_classes)
    results = []
    with mesh:
        for batch in data_loader:
            dets, labels, valid = step(
                params, jnp.asarray(batch['img']),
                jnp.asarray(batch['img_shape']),
                jnp.asarray(batch['scale_factor']))
            dets, labels, valid = (np.asarray(dets), np.asarray(labels),
                                   np.asarray(valid))
            for i in range(dets.shape[0]):
                d = np.where(valid[i][:, None], dets[i],
                             -np.ones_like(dets[i]))
                results.append(bbox2result(d, labels[i], num_classes))
    return results

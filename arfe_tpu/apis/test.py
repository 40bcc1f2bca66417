"""Dataset evaluation API.

TPU-native counterpart of ref: mmdet/apis/test.py:37-209. Detections stay on
device as fixed-size arrays; multi-chip eval shards images over the data
mesh with NO per-batch host round-trip (dispatch stays async, device
buffers are gathered once at the end — replacing the reference's pickle
tmpfile / uint8-tensor all_gather collection, apis/test.py:137-209), and
the COCO matching itself can run on device (core/evaluation/device_eval.py,
the BASELINE.json "psum'd COCO stat accumulators" path).
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


def _model_num_classes(model):
    if hasattr(model, 'bbox_head'):
        return model.bbox_head.num_classes
    head = model.roi_head.bbox_head
    if isinstance(head, (list, tuple)):   # cascade: per-stage heads
        head = head[-1]
    return head.num_classes


def _make_aug_runner(model, _aug_cache, shard=None, out_shard=None,
                     assemble=None):
    """TTA batch runner: drives model.aug_test with per-aug arrays. Flip
    flags are static per aug (stable MultiScaleFlipAug order), so the jit
    caches one program per aug configuration. ``shard``: optional
    NamedSharding constraint applied to each aug's image batch.
    ``out_shard``: optional output sharding (multi-host runs replicate the
    fixed-size outputs so every process can read them). ``assemble``:
    optional fn(array_dict) -> dict of global jax.Arrays, used on
    multi-host runs to build each aug's global batch from the local
    slice."""
    import jax
    import jax.numpy as jnp

    def run_aug(p, batch):
        augs = batch['augs']
        flips = tuple(bool(a['img_metas'][0].get('flip', False))
                      for a in augs)
        if assemble is not None:
            glob = [assemble({'img': a['img'], 'img_shape': a['img_shape'],
                              'scale_factor': a['scale_factor']})
                    for a in augs]
            imgs = tuple(g['img'] for g in glob)
            shps = tuple(g['img_shape'] for g in glob)
            sfs = tuple(g['scale_factor'] for g in glob)
        else:
            imgs = tuple(jnp.asarray(a['img']) for a in augs)
            shps = tuple(jnp.asarray(a['img_shape']) for a in augs)
            sfs = tuple(jnp.asarray(a['scale_factor']) for a in augs)

        key = (flips, tuple(im.shape for im in imgs))
        if key not in _aug_cache:
            def fn(p, imgs, shps, sfs):
                if shard is not None:
                    imgs = tuple(jax.lax.with_sharding_constraint(im, shard)
                                 for im in imgs)
                out = model.aug_test(p, list(imgs), list(shps), list(sfs),
                                     list(flips), rescale=True)
                if out_shard is not None:
                    out = jax.tree_util.tree_map(
                        lambda x: jax.lax.with_sharding_constraint(
                            x, out_shard), out)
                return out
            _aug_cache[key] = jax.jit(fn)
        return _aug_cache[key](p, imgs, shps, sfs)

    return run_aug


def _postprocess_batch(model, out, metas, num_classes, aug_mode, results):
    """Device outputs -> reference result format (per image: list of
    per-class (n, 5) arrays, or (bbox_results, segm_results))."""
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
            meta = metas[i]
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
    return dets.shape[0]


def single_device_test(model, params, data_loader, show_progress=True):
    """(ref: apis/test.py:37-60 single_gpu_test). Returns the reference's
    result format: per image, list of per-class (n, 5) arrays."""
    import jax
    import jax.numpy as jnp

    jitted = jax.jit(lambda p, img, shapes, sf: model.simple_test(
        p, img, shapes, sf, rescale=True))
    run_aug = _make_aug_runner(model, {})
    num_classes = _model_num_classes(model)
    results = []
    t0 = time.time()
    n_done = 0
    for batch in data_loader:
        aug_mode = 'augs' in batch
        if aug_mode:
            out = run_aug(params, batch)
            metas = batch['img_metas']
        else:
            out = jitted(params, jnp.asarray(batch['img']),
                         jnp.asarray(batch['img_shape']),
                         jnp.asarray(batch['scale_factor']))
            metas = batch['img_metas']
        n_done += _postprocess_batch(model, out, metas, num_classes,
                                     aug_mode, results)
        if show_progress:
            rate = n_done / max(time.time() - t0, 1e-6)
            print(f'\r{n_done} imgs, {rate:.1f} img/s', end='', flush=True)
    if show_progress:
        print()
    return results


def multi_device_test(model, params, data_loader, mesh, show_progress=True):
    """Data-parallel eval over a mesh with full single-device feature
    parity (masks + TTA). Images are sharded on the 'data' axis; the
    fixed-size per-batch outputs stay on device (async dispatch, no host
    sync inside the loop) and are gathered in ONE transfer phase at the
    end — the designed replacement for the reference's pickled result
    collection (ref: mmdet/apis/test.py:87-209)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() > 1:
        return _multihost_device_test(model, params, data_loader, mesh,
                                      show_progress)

    data = NamedSharding(mesh, P('data'))

    @jax.jit
    def step(p, img, shapes, sf):
        img = jax.lax.with_sharding_constraint(img, data)
        return model.simple_test(p, img, shapes, sf, rescale=True)

    run_aug = _make_aug_runner(model, {}, shard=data)
    num_classes = _model_num_classes(model)
    pending = []      # (device outputs, metas, aug_mode) per batch
    n_disp = 0
    t0 = time.time()
    with mesh:
        for batch in data_loader:
            aug_mode = 'augs' in batch
            if aug_mode:
                out = run_aug(params, batch)
            else:
                out = step(params, jnp.asarray(batch['img']),
                           jnp.asarray(batch['img_shape']),
                           jnp.asarray(batch['scale_factor']))
            pending.append((out, batch['img_metas'], aug_mode))
            n_disp += len(batch['img_metas'])
            if show_progress:
                print(f'\r{n_disp} imgs dispatched', end='', flush=True)
    results = []
    for out, metas, aug_mode in pending:
        _postprocess_batch(model, out, metas, num_classes, aug_mode,
                           results)
    if show_progress:
        rate = len(results) / max(time.time() - t0, 1e-6)
        print(f'\r{len(results)} imgs, {rate:.1f} img/s', flush=True)
    return results


def _multihost_device_test(model, params, data_loader, mesh,
                           show_progress):
    """Multi-process (multi-host) eval: each process feeds only its local
    slice of every global batch (``jax.make_array_from_process_local_data``
    via parallel/multihost.py:global_batch) over a mesh that spans hosts;
    the fixed-size outputs are replicated by an output sharding constraint
    (a compiler all_gather over ICI/DCN) so EVERY process holds the full
    detection buffers — the reference's pickle/tmpfile result collection
    (ref: mmdet/apis/test.py:137-209) has no host-side counterpart here.

    Per-image host metadata (ori_shape for mask paste, the remainder-batch
    'pad' flag) rides the same path as small numeric arrays, so no host
    object needs cross-process transport. Results return in global batch
    order on every process; padded remainder entries are dropped."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.multihost import global_batch

    data = NamedSharding(mesh, P('data'))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(p, img, shapes, sf):
        img = jax.lax.with_sharding_constraint(img, data)
        out = model.simple_test(p, img, shapes, sf, rescale=True)
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), out)

    gather_side = jax.jit(lambda t: t, out_shardings=repl)

    def assemble(arrs):
        return global_batch(mesh, arrs)

    run_aug = _make_aug_runner(model, {}, shard=data, out_shard=repl,
                               assemble=assemble)
    num_classes = _model_num_classes(model)
    pending = []      # (device outputs, side info, aug_mode) per batch
    n_disp = 0
    t0 = time.time()
    with mesh:
        for batch in data_loader:
            aug_mode = 'augs' in batch
            metas = batch['img_metas']
            side_np = {
                'ori_hw': np.asarray(
                    [m.get('ori_shape', (0, 0, 0))[:2] for m in metas],
                    np.int32),
                'pad': np.asarray([bool(m.get('pad', False))
                                   for m in metas]),
            }
            side = gather_side(global_batch(mesh, side_np))
            if aug_mode:
                out = run_aug(params, batch)
            else:
                g = global_batch(mesh, {
                    'img': batch['img'], 'img_shape': batch['img_shape'],
                    'scale_factor': batch['scale_factor']})
                out = step(params, g['img'], g['img_shape'],
                           g['scale_factor'])
            pending.append((out, side, aug_mode))
            n_disp += len(metas)
            if show_progress:
                print(f'\r{n_disp} local imgs dispatched', end='',
                      flush=True)
    results = []
    for out, side, aug_mode in pending:
        ori = np.asarray(side['ori_hw'])
        pads = np.asarray(side['pad'])
        metas = [dict(ori_shape=(int(h), int(w), 3)) for h, w in ori]
        batch_res = []
        _postprocess_batch(model, out, metas, num_classes, aug_mode,
                           batch_res)
        results.extend(r for r, p in zip(batch_res, pads) if not p)
    if show_progress:
        rate = len(results) / max(time.time() - t0, 1e-6)
        print(f'\r{len(results)} imgs, {rate:.1f} img/s', flush=True)
    return results


def multi_device_coco_eval(model, params, data_loader, dataset, mesh,
                           show_progress=True):
    """The north-star multi-chip eval: COCO bbox stats accumulated ON
    DEVICE. Per batch, the jitted step runs inference AND the COCOeval
    greedy matching (core/evaluation/device_eval.py) with images sharded
    over 'data'; the per-class gt counters are reduced on device (a psum
    over the sharded axis under GSPMD); the compact match buffers transfer
    to host once at the end, where only the global score sort + PR
    integration runs.

    Args:
        dataset: a CocoDataset (provides .coco gt api + .cat2label, images
            in loader order).
    Returns:
        dict of the 12 standard COCO stats (same keys as
        CocoDataset.evaluate's bbox metrics).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.evaluation.coco_eval import IOU_THRS
    from ..core.evaluation.device_eval import (_np_area_rngs,
                                               evaluate_from_buffers,
                                               gt_arrays_from_coco,
                                               match_image)

    num_classes = _model_num_classes(model)
    iou_thrs = jnp.asarray(IOU_THRS, jnp.float32)
    area_rngs = jnp.asarray(_np_area_rngs(), jnp.float32)
    max_gt = int(max(
        (len(dataset.coco.img_ann_map.get(i, []))
         for i in dataset.img_ids), default=1)) or 1
    data = NamedSharding(mesh, P('data'))

    @jax.jit
    def step(p, img, shapes, sf, gt_xywh, gt_labels, gt_crowd, gt_ign,
             gt_area, gt_valid):
        img = jax.lax.with_sharding_constraint(img, data)
        out = model.simple_test(p, img, shapes, sf, rescale=True)
        dets, labels, valid = out[0], out[1], out[2]

        def one(d, l, v, gx, gl, gc, gi, ga, gv):
            return match_image(d.astype(jnp.float32), l, v, gx, gl, gc,
                               gi, ga, gv, iou_thrs, area_rngs,
                               num_classes)

        matched, ignored, num_gt = jax.vmap(one)(
            dets, labels, valid, gt_xywh, gt_labels, gt_crowd, gt_ign,
            gt_area, gt_valid)
        scores = jnp.where(valid, dets[..., 4], -1.0)
        # on-device cross-chip reduction of the per-class gt counters
        return scores, labels, matched, ignored, num_gt.sum(axis=0)

    img_pos = 0
    bufs = []          # device arrays per batch
    num_gt_total = None
    with mesh:
        for batch in data_loader:
            b = len(batch['img_metas'])
            ids = dataset.img_ids[img_pos:img_pos + b]
            img_pos += b
            gt = [np.stack(arrs) for arrs in zip(
                *(gt_arrays_from_coco(dataset.coco, iid, dataset.cat2label,
                                      max_gt) for iid in ids))]
            scores, labels, matched, ignored, num_gt = step(
                params, jnp.asarray(batch['img']),
                jnp.asarray(batch['img_shape']),
                jnp.asarray(batch['scale_factor']),
                *(jnp.asarray(g) for g in gt))
            bufs.append((scores, labels, matched, ignored))
            num_gt_total = num_gt if num_gt_total is None \
                else num_gt_total + num_gt
            if show_progress:
                print(f'\r{img_pos} imgs dispatched', end='', flush=True)
    if show_progress:
        print()
    scores = np.concatenate([np.asarray(b[0]) for b in bufs])
    labels = np.concatenate([np.asarray(b[1]) for b in bufs])
    matched = np.concatenate([np.asarray(b[2]) for b in bufs])
    ignored = np.concatenate([np.asarray(b[3]) for b in bufs])
    out = evaluate_from_buffers(scores, labels, matched, ignored,
                                np.asarray(num_gt_total), num_classes)
    stats = out['stats']
    return {('bbox_mAP' if k == 'AP' else f'bbox_{k}'): v
            for k, v in stats.items()}

"""Single-image inference API.

TPU-native counterpart of ref: mmdet/apis/inference.py:17-155
(init_detector / inference_detector / show_result_pyplot). The public
contract matches the reference (BASELINE.json north star): config +
checkpoint in, per-class (n, 5) numpy arrays out.
"""
from __future__ import annotations

import functools

import numpy as np

from ..config import Config
from ..core.bbox.transforms import bbox2result
from ..data.pipelines import Compose
from ..models import build_detector


class Detector:
    """Bundles (model, params, cfg, CLASSES) — the stateful-model stand-in
    for the reference's nn.Module detector."""

    def __init__(self, model, params, cfg, classes=None):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.CLASSES = classes

    @functools.cached_property
    def _jitted_simple_test(self):
        import jax
        return jax.jit(lambda p, img, shapes, sf: self.model.simple_test(
            p, img, shapes, sf, rescale=True))


def init_detector(config, checkpoint=None, device=None):
    """(ref: apis/inference.py:17-48)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model_cfg = config.todict()['model']
    model_cfg.pop('pretrained', None)
    model = build_detector(model_cfg, test_cfg=config.todict().get('test_cfg'))
    classes = None
    if checkpoint is not None:
        from ..utils.checkpoint import load_checkpoint
        import jax.numpy as jnp
        import jax
        params, meta, _ = load_checkpoint(checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        classes = meta.get('CLASSES')
    else:
        import jax
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if classes is None:
        from ..core.evaluation import get_classes
        try:
            classes = get_classes('coco')
        except Exception:
            classes = None
    return Detector(model, params, config, classes)


def _build_test_pipeline(cfg):
    pipeline = [dict(p) for p in cfg.todict()['data']['test']['pipeline']]
    assert pipeline[0]['type'] in ('LoadImageFromFile', 'LoadImage')
    pipeline[0] = dict(type='LoadImage')
    return Compose(pipeline)


def inference_detector(detector, img):
    """(ref: apis/inference.py:68-107).

    Args:
        detector: from :func:`init_detector`.
        img: path or ndarray (BGR HWC like cv2).
    Returns:
        list[num_classes] of (n, 5) arrays [x1, y1, x2, y2, score].
    """
    import jax.numpy as jnp

    pipeline = _build_test_pipeline(detector.cfg)
    data = pipeline(dict(img=img))
    # MultiScaleFlipAug returns dict of lists; single-scale -> first entry
    img_arr = data['img'][0] if isinstance(data['img'], list) else data['img']
    meta = data['img_metas'][0] if isinstance(data['img_metas'], list) \
        else data['img_metas']
    # pad to a static bucket to avoid per-image recompiles
    h, w = img_arr.shape[:2]
    bh = ((h + 127) // 128) * 128
    bw = ((w + 127) // 128) * 128
    padded = np.zeros((bh, bw, img_arr.shape[2]), np.float32)
    padded[:h, :w] = img_arr
    img_shapes = jnp.asarray([[float(meta['img_shape'][0]),
                               float(meta['img_shape'][1])]])
    sf = jnp.asarray(
        np.asarray(meta['scale_factor'], np.float32).reshape(1, 4))
    out = detector._jitted_simple_test(
        detector.params, jnp.asarray(padded[None]), img_shapes, sf)
    dets, labels, valid = out[:3]
    dets = np.asarray(dets[0])
    labels = np.asarray(labels[0])
    valid = np.asarray(valid[0])
    dets = np.where(valid[:, None], dets, -np.ones_like(dets))
    num_classes = _num_classes(detector)
    bbox_results = bbox2result(dets, labels, num_classes)
    if len(out) == 3:
        return bbox_results
    # mask path: paste per-detection masks at original-image scale
    # (ref: two_stage.py simple_test returning (bbox, segm) tuples)
    from ..core.mask import paste_masks_np

    mask_pred = 1.0 / (1.0 + np.exp(-np.asarray(out[3][0])))
    oh, ow = meta['ori_shape'][:2]
    pasted = paste_masks_np(mask_pred, dets[:, :4], oh, ow)
    keep = dets[:, 4] > -1
    segm_results = [
        [pasted[i] for i in np.where(keep & (labels == c))[0]]
        for c in range(num_classes)]
    return bbox_results, segm_results


def _num_classes(detector):
    model = detector.model
    if hasattr(model, 'bbox_head'):
        return model.bbox_head.num_classes
    return model.roi_head.bbox_head.num_classes


def show_result(img, result, class_names=None, score_thr=0.3, out_file=None):
    """Draw detections (ref: detectors/base.py:152-237 show_result)."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img)
    img = img.copy()
    for label, bboxes in enumerate(result):
        for bbox in bboxes:
            if bbox[4] < score_thr:
                continue
            x1, y1, x2, y2 = bbox[:4].astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
            name = class_names[label] if class_names else str(label)
            cv2.putText(img, f'{name}: {bbox[4]:.2f}', (x1, max(y1 - 3, 0)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    if out_file is not None:
        cv2.imwrite(out_file, img)
    return img


async def async_inference_detector(detector, img):
    """Async inference (ref: mmdet/apis/inference.py:110-135).

    JAX dispatch is already asynchronous; this coroutine moves the blocking
    host-side materialization off the event loop so concurrent requests
    overlap (the reference concurrency-tests this with torch CUDA streams;
    here the XLA stream plays that role).
    """
    import asyncio
    import functools

    fn = functools.partial(inference_detector, detector, img)
    return await asyncio.get_event_loop().run_in_executor(None, fn)

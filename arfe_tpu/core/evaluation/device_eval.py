"""On-device COCO stat accumulation for multi-chip eval.

The north-star eval distribution (BASELINE.json; SURVEY.md §2.4, replacing
ref mmdet/apis/test.py:137-209 collect_results_cpu/gpu): images are sharded
over the data mesh, the pycocotools-protocol greedy matching
(core/evaluation/coco_eval.py:_evaluate_img, itself mirroring COCOeval
evaluateImg) runs INSIDE the jitted step on fixed-size arrays, and the
per-image match buffers stay on device — reduced/gathered by XLA over ICI —
until one host transfer at the end. The host then only sorts scores and
integrates PR curves (cheap, O(total dets)).

Matching semantics reproduced exactly (verified vs COCOEvaluator in
tests/test_device_eval.py):
- greedy in det score order; a det of class c only competes for gts of c
- two tiers: best-IoU available non-ignored gt first; ignored gts (crowd /
  ann-ignore / outside area range) only if no non-ignored match; IoU ties
  resolved to the LAST gt in scan order (pycocotools `>=` update)
- crowd gts may be matched by multiple dets
- unmatched dets with area outside the range are ignored
- num_gt counts non-ignored gts per (area-range, class)
"""
from __future__ import annotations

import numpy as np

from .coco_eval import AREA_RNGS, IOU_THRS, RECALL_THRS


def _np_area_rngs(area_rngs=None):
    rngs = area_rngs or AREA_RNGS
    return np.asarray(list(rngs.values()), np.float32)


def match_image(dets, labels, valid, gt_xywh, gt_labels, gt_crowd,
                gt_ignore, gt_area, gt_valid, iou_thrs, area_rngs,
                num_classes):
    """Greedy COCO matching for one image's padded detections.

    Args:
        dets: (D, 5) [x1, y1, x2, y2, score] in the original image frame,
            score-sorted descending (the multiclass_nms output order).
        labels: (D,) int32; valid: (D,) bool.
        gt_xywh: (G, 4) COCO-format gt boxes; gt_labels (G,) int32;
        gt_crowd / gt_ignore / gt_valid: (G,) bool; gt_area: (G,) float
            (the ann 'area' — segmentation area, not bbox area).
        iou_thrs: (T,); area_rngs: (A, 2); num_classes: static int.

    Returns:
        matched (A, T, D) bool, ignored (A, T, D) bool,
        num_gt (A, num_classes) int32.
    """
    import jax
    import jax.numpy as jnp

    d_cap = dets.shape[0]
    t = iou_thrs.shape[0]
    a = area_rngs.shape[0]
    g = gt_xywh.shape[0]

    # pycocotools IoU: crowd gts use det-area denominator
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dw = jnp.maximum(dets[:, 2] - dets[:, 0], 0.0)
    dh = jnp.maximum(dets[:, 3] - dets[:, 1], 0.0)
    gx1, gy1 = gt_xywh[:, 0], gt_xywh[:, 1]
    gx2 = gt_xywh[:, 0] + gt_xywh[:, 2]
    gy2 = gt_xywh[:, 1] + gt_xywh[:, 3]
    ix1 = jnp.maximum(dx1[:, None], gx1[None, :])
    iy1 = jnp.maximum(dy1[:, None], gy1[None, :])
    ix2 = jnp.minimum(dets[:, 2][:, None], gx2[None, :])
    iy2 = jnp.minimum(dets[:, 3][:, None], gy2[None, :])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    d_area_box = (dw * dh)[:, None]
    g_area_box = (gt_xywh[:, 2] * gt_xywh[:, 3])[None, :]
    union = jnp.where(gt_crowd[None, :], d_area_box,
                      d_area_box + g_area_box - inter)
    iou = inter / jnp.maximum(union, 1e-10)            # (D, G)

    # per-range gt ignore (ref: coco_eval.py:93-96)
    lo = area_rngs[:, 0][:, None]
    hi = area_rngs[:, 1][:, None]
    ign_a = (gt_ignore | gt_crowd)[None, :] | \
        (gt_area[None, :] < lo) | (gt_area[None, :] > hi)   # (A, G)

    thr_eff = jnp.minimum(iou_thrs, 1.0 - 1e-10)       # (T,)
    cls_ok = (labels[:, None] == gt_labels[None, :]) & gt_valid[None, :]

    def body(d, carry):
        taken, matched, ignored = carry
        iou_d = iou[d]                                  # (G,)
        base = cls_ok[d] & valid[d]                     # (G,)
        avail = (~taken) | gt_crowd[None, None, :]      # (A, T, G)
        ok = base[None, None, :] & avail & \
            (iou_d[None, None, :] >= thr_eff[None, :, None])
        t1 = ok & ~ign_a[:, None, :]
        t2 = ok & ign_a[:, None, :]
        use1 = t1.any(-1)
        sel = jnp.where(use1[..., None], t1, t2)        # (A, T, G)
        has = sel.any(-1)
        # pycocotools updates best on >=, so IoU ties go to the LAST gt
        masked = jnp.where(sel, iou_d[None, None, :], -1.0)
        pick = g - 1 - jnp.argmax(masked[..., ::-1], axis=-1)   # (A, T)
        ign_d = jnp.take_along_axis(
            jnp.broadcast_to(ign_a[:, None, :], (a, t, g)),
            pick[..., None], axis=-1)[..., 0]
        onehot = jax.nn.one_hot(pick, g, dtype=bool)
        taken = taken | (has[..., None] & onehot)
        matched = matched.at[:, :, d].set(has)
        ignored = ignored.at[:, :, d].set(has & ign_d)
        return taken, matched, ignored

    taken0 = jnp.zeros((a, t, g), bool)
    matched0 = jnp.zeros((a, t, d_cap), bool)
    ignored0 = jnp.zeros((a, t, d_cap), bool)
    _, matched, ignored = jax.lax.fori_loop(
        0, d_cap, body, (taken0, matched0, ignored0))

    # unmatched out-of-range dets are ignored (ref: coco_eval.py:134-138)
    d_out = (d_area_box[:, 0][None, :] < lo) | \
        (d_area_box[:, 0][None, :] > hi)               # (A, D)
    ignored = ignored | (d_out[:, None, :] & ~matched & valid[None, None, :])

    cls_onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.int32)
    counted = (gt_valid[None, :] & ~ign_a).astype(jnp.int32)   # (A, G)
    num_gt = jnp.einsum('ag,gc->ac', counted, cls_onehot)
    return matched, ignored, num_gt


def gt_arrays_from_coco(coco, img_id, cat2label, max_gt):
    """Padded per-image gt arrays for :func:`match_image` from a COCO api
    object (host side, numpy)."""
    anns = coco.img_ann_map.get(img_id, [])
    g = max_gt
    gt_xywh = np.zeros((g, 4), np.float32)
    gt_labels = np.full((g,), -1, np.int32)
    gt_crowd = np.zeros((g,), bool)
    gt_ignore = np.zeros((g,), bool)
    gt_area = np.zeros((g,), np.float32)
    gt_valid = np.zeros((g,), bool)
    for i, ann in enumerate(anns[:g]):
        gt_xywh[i] = np.asarray(ann['bbox'], np.float32)
        gt_labels[i] = cat2label.get(ann['category_id'], -1)
        gt_crowd[i] = bool(ann.get('iscrowd', 0))
        gt_ignore[i] = bool(ann.get('ignore', 0))
        gt_area[i] = float(ann.get(
            'area', ann['bbox'][2] * ann['bbox'][3]))
        gt_valid[i] = True
    return (gt_xywh, gt_labels, gt_crowd, gt_ignore, gt_area, gt_valid)


def evaluate_from_buffers(scores, labels, matched, ignored, num_gt,
                          num_classes, iou_thrs=None, max_dets=(1, 10, 100),
                          area_rng_names=None):
    """Host finalize: global score sort + PR integration, identical math to
    COCOEvaluator.evaluate (coco_eval.py:147-208) given the per-image device
    match buffers.

    Args:
        scores: (N, D) det scores (padding < 0); labels (N, D) int.
        matched / ignored: (N, A, T, D) bool.
        num_gt: (A, num_classes) int — already summed over images/chips.
    Returns:
        dict with 'precision' (T, R, K, A, M), 'recall' and 'stats'.
    """
    iou_thrs = np.asarray(iou_thrs) if iou_thrs is not None else IOU_THRS
    t = len(iou_thrs)
    r = len(RECALL_THRS)
    n, a = matched.shape[0], matched.shape[1]
    m_num = len(max_dets)
    names = area_rng_names or list(AREA_RNGS)
    precision = -np.ones((t, r, num_classes, a, m_num))
    recall = -np.ones((t, num_classes, a, m_num))

    scores = np.asarray(scores)
    labels = np.asarray(labels)
    matched = np.asarray(matched)
    ignored = np.asarray(ignored)
    num_gt = np.asarray(num_gt)

    for ki in range(num_classes):
        # per image, dets of this class in score order (buffers are sorted)
        img_idx, det_idx = np.where((labels == ki) & (scores >= 0))
        cls_scores = scores[img_idx, det_idx]
        # per-image rank of each det within the class (for maxDet slicing)
        ranks = np.zeros(len(img_idx), np.int64)
        if len(img_idx):
            change = np.r_[True, img_idx[1:] != img_idx[:-1]]
            starts = np.where(change)[0]
            ranks = np.arange(len(img_idx))
            ranks -= np.repeat(starts, np.diff(np.r_[starts, len(img_idx)]))
        for ai in range(a):
            for mi, max_det in enumerate(max_dets):
                keep = ranks < max_det
                sc = cls_scores[keep]
                order = np.argsort(-sc, kind='mergesort')
                mm = matched[img_idx[keep], ai, :, det_idx[keep]][order]
                ii = ignored[img_idx[keep], ai, :, det_idx[keep]][order]
                npig = int(num_gt[ai, ki])
                if npig == 0:
                    continue
                tps = (mm & ~ii).T.astype(np.float64)    # (T, n_det)
                fps = (~mm & ~ii).T.astype(np.float64)
                tp_sum = np.cumsum(tps, axis=1)
                fp_sum = np.cumsum(fps, axis=1)
                for ti in range(t):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    rc = tp / npig
                    pr = tp / np.maximum(tp + fp, np.spacing(1))
                    recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0
                    pr = pr.tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, RECALL_THRS, side='left')
                    q = np.zeros(r)
                    for ri, pi in enumerate(inds):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[ti, :, ki, ai, mi] = q

    def _ap(iou_thr=None, area='all', max_det=100):
        ai = names.index(area)
        mi = list(max_dets).index(max_det)
        p = precision[:, :, :, ai, mi]
        if iou_thr is not None:
            hits = np.where(np.isclose(iou_thrs, iou_thr))[0]
            if not len(hits):
                return -1.0
            p = p[int(hits[0]):int(hits[0]) + 1]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    def _ar(area='all', max_det=100):
        ai = names.index(area)
        mi = list(max_dets).index(max_det)
        rr = recall[:, :, ai, mi]
        rr = rr[rr > -1]
        return float(rr.mean()) if rr.size else -1.0

    md = tuple(max_dets)
    stats = {
        'AP': _ap(), 'AP50': _ap(0.5), 'AP75': _ap(0.75),
        'APs': _ap(area='small'), 'APm': _ap(area='medium'),
        'APl': _ap(area='large'),
        f'AR@{md[0]}': _ar(max_det=md[0]),
        f'AR@{md[1]}': _ar(max_det=md[1]),
        f'AR@{md[2]}': _ar(max_det=md[2]),
        'ARs': _ar(area='small'), 'ARm': _ar(area='medium'),
        'ARl': _ar(area='large'),
    }
    return dict(precision=precision, recall=recall, stats=stats)

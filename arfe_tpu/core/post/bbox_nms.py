"""Multi-class NMS with static shapes.

TPU-native counterpart of ref: mmdet/core/post_processing/bbox_nms.py:6-57.
The reference boolean-filters by score threshold (dynamic shape); here low
scores are masked to invalid and a static candidate cap (``pre_nms_cap``,
top-k by score over all (box, class) pairs) bounds the NMS problem size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def multiclass_nms(multi_bboxes, multi_scores, score_thr, nms_cfg,
                   max_num=-1, score_factors=None, pre_nms_cap=2000,
                   valid_mask=None):
    """NMS over (box, class) candidates.

    Args:
        multi_bboxes: (n, 4) shared or (n, num_classes*4) class-wise boxes.
        multi_scores: (n, num_classes + 1); last column is background and is
            ignored (ref convention since mmdet v2.0).
        score_thr: candidates at or below this score are dropped.
        nms_cfg: e.g. ``dict(type='nms', iou_thr=0.5)``.
        max_num: output capacity (ref ``max_per_img``); required here (>0)
            for static shapes.
        score_factors: optional (n,) multiplier applied to scores before NMS
            (ref: bbox_nms.py:41-42; used by FCOS centerness).
        pre_nms_cap: static cap on the number of candidates entering NMS
            (top-k by score). The reference has no such cap, but with
            ``score_thr=0.05`` the true candidate count is far below this.
        valid_mask: optional (n,) bool row validity (padding rows False).

    Returns:
        dets: (max_num, 5) boxes+scores, padding rows have score -1.
        labels: (max_num,) int32 class ids (0-based; padding 0).
        out_valid: (max_num,) bool.
    """
    # Deferred to avoid a package-import cycle (ops.nms uses core.bbox.iou).
    from ...ops.nms import batched_nms

    assert max_num > 0, 'static multiclass_nms requires max_num > 0'
    n = multi_scores.shape[0]
    num_classes = multi_scores.shape[1] - 1
    if multi_bboxes.shape[-1] > 4:
        bboxes = multi_bboxes.reshape(n, num_classes, 4)
    else:
        bboxes = jnp.broadcast_to(multi_bboxes[:, None, :],
                                  (n, num_classes, 4))
    scores = multi_scores[:, :-1]
    if score_factors is not None:
        scores = scores * score_factors[:, None]

    cand_valid = scores > score_thr
    if valid_mask is not None:
        cand_valid = cand_valid & valid_mask[:, None]

    flat_scores = scores.reshape(-1)
    flat_valid = cand_valid.reshape(-1)
    flat_boxes = bboxes.reshape(-1, 4)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))

    cap = min(pre_nms_cap, flat_scores.shape[0])
    masked = jnp.where(flat_valid, flat_scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, cap)
    top_valid = jnp.isfinite(top_scores)
    top_boxes = flat_boxes[top_idx] * top_valid[:, None].astype(jnp.float32)
    top_labels = flat_labels[top_idx]

    dets, keep_idx, out_valid = batched_nms(
        top_boxes, jnp.where(top_valid, top_scores, -jnp.inf), top_labels,
        nms_cfg, max_out=max_num, valid_mask=top_valid)
    labels = jnp.where(out_valid, top_labels[keep_idx], 0).astype(jnp.int32)
    return dets, labels, out_valid

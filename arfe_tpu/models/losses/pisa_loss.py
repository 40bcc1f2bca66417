"""PISA losses: ISR-P reweighting and CARL
(ref: mmdet/models/losses/pisa_loss.py:6-180).

TPU-native departures:
- the reference's per-class/per-gt python loops over dynamic index sets are
  replaced by a static double-argsort group-ranking: samples are ranked
  inside (gt) groups and then inside (class) groups with one stable sort
  each, masked entries routed to a dump group.
- everything is computed over the full padded sample set with pos masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.bbox.iou import bbox_overlaps


def group_rank_desc(values, groups, mask, num_groups):
    """Descending rank (0 = largest) of ``values`` within each group.

    Masked-out entries go to a dump group and get meaningless ranks.
    Stable: ties keep original order.
    """
    n = values.shape[0]
    g = jnp.where(mask, groups, num_groups).astype(jnp.int32)
    order1 = jnp.argsort(-values, stable=True)
    order2 = jnp.argsort(g[order1], stable=True)
    order = order1[order2]            # original idx at each sorted slot
    pos_in_sorted = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    group_start = jax.ops.segment_min(pos_in_sorted, g,
                                      num_segments=num_groups + 1)
    return pos_in_sorted - group_start[g]


def isr_p(cls_score, bbox_pred, labels, label_weights, bbox_targets,
          bbox_weights, rois, gt_inds, loss_cls, bbox_coder, k=2, bias=0,
          num_class=80, num_gt_groups=None):
    """Importance-based Sample Reweighting, positive part
    (ref: pisa_loss.py:6-119).

    Args:
        cls_score: (N, C) detached logits; bbox_pred: (N, 4) or (N, C*4).
        labels/label_weights: (N,); bbox_targets/bbox_weights: (N, 4).
        rois: (N, 4) anchors or (N, 5) rois.
        gt_inds: (N,) globally-unique assigned gt index at positives
            (e.g. img_idx * G + gt_idx), anything elsewhere.
        num_gt_groups: static upper bound on distinct gt groups
            (defaults to N).
    Returns:
        new label_weights (N,).
    """
    n = labels.shape[0]
    num_gt_groups = num_gt_groups or n
    pos = (labels >= 0) & (labels < num_class) & (label_weights > 0)
    num_pos = pos.sum()

    cls_score = jax.lax.stop_gradient(cls_score.astype(jnp.float32))
    bbox_pred = jax.lax.stop_gradient(bbox_pred.astype(jnp.float32))
    pos_rois = rois[:, 1:5] if rois.shape[-1] == 5 else rois
    safe_labels = jnp.clip(labels, 0, num_class - 1)
    if bbox_pred.shape[-1] > 4:
        bp = bbox_pred.reshape(n, -1, 4)
        delta_pred = jnp.take_along_axis(
            bp, safe_labels[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    else:
        delta_pred = bbox_pred
    decoded_pred = bbox_coder.decode(pos_rois, delta_pred)
    decoded_tgt = bbox_coder.decode(pos_rois, bbox_targets)
    ious = bbox_overlaps(decoded_pred, decoded_tgt, is_aligned=True)
    ious = jnp.where(pos, ious, 0.0)

    # per-class positive counts -> max_l_num
    cls_cnt = jax.ops.segment_sum(
        pos.astype(jnp.int32),
        jnp.where(pos, safe_labels, num_class).astype(jnp.int32),
        num_segments=num_class + 1)[:num_class]
    max_l_num = jnp.maximum(cls_cnt.max(), 1).astype(jnp.float32)

    # IoU-HLR: rank inside gt groups, then inside class groups
    t_rank = group_rank_desc(ious, gt_inds, pos, num_gt_groups)
    adj = ious + (max_l_num - t_rank.astype(jnp.float32))
    l_rank = group_rank_desc(adj, safe_labels, pos, num_class)

    w = label_weights * (max_l_num - l_rank.astype(jnp.float32)) / max_l_num
    imp = (bias + w * (1 - bias)) ** k

    # normalize so the weighted positive cls loss keeps its magnitude
    per_elem = loss_cls(cls_score, safe_labels, reduction_override='none')
    if per_elem.ndim > 1:
        per_elem = per_elem.sum(-1)
    per_elem = jnp.where(pos, per_elem, 0.0)
    ori = (per_elem * label_weights).sum()
    new = (per_elem * imp).sum()
    ratio = jnp.where(new > 0, ori / jnp.maximum(new, 1e-12), 1.0)
    new_weights = jnp.where(pos, imp * ratio, label_weights)
    return jnp.where(num_pos > 0, new_weights, label_weights)


def carl_loss(cls_score, labels, bbox_pred, bbox_targets, loss_bbox, k=1,
              bias=0.2, avg_factor=None, sigmoid=False, num_class=80,
              valid=None):
    """Classification-Aware Regression Loss (ref: pisa_loss.py:122-180).

    Returns dict(loss_carl=scalar).
    """
    n = labels.shape[0]
    pos = (labels >= 0) & (labels < num_class)
    if valid is not None:
        pos = pos & valid
    safe_labels = jnp.clip(labels, 0, num_class - 1).astype(jnp.int32)
    if sigmoid:
        score = jax.nn.sigmoid(cls_score)
    else:
        score = jax.nn.softmax(cls_score, -1)
    pos_score = jnp.take_along_axis(score, safe_labels[:, None], 1)[:, 0]
    w = (bias + (1 - bias) * pos_score) ** k
    w = jnp.where(pos, w, 0.0)
    num_pos = pos.sum().astype(jnp.float32)
    ratio = num_pos / jnp.maximum(w.sum(), 1e-12)
    w = w * ratio
    if avg_factor is None:
        avg_factor = n
    if bbox_pred.shape[-1] > 4:
        bp = bbox_pred.reshape(n, -1, 4)
        bbox_pred = jnp.take_along_axis(
            bp, safe_labels[:, None, None], axis=1)[:, 0]
    reg = loss_bbox(bbox_pred, bbox_targets, reduction_override='none')
    reg = reg * pos[:, None] / avg_factor
    return dict(loss_carl=(reg * w[:, None]).sum())

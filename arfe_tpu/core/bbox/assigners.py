"""Assigners (static, mask-based).

TPU-native counterpart of ref: mmdet/core/bbox/assigners/max_iou_assigner.py.
Instead of dynamic-shape index lists, everything is computed over padded
arrays with validity masks: ground-truth boxes come as (G_max, 4) with a
``gt_valid`` mask, anchors/proposals as (N, 4) with an optional validity
mask. The result is a per-box ``assigned_gt_inds`` in the reference's
encoding: -1 = ignore, 0 = negative, k > 0 = matched to gt k-1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import BBOX_ASSIGNERS
from ...layers import take_rows
from .iou import bbox_overlaps


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    def __init__(self, pos_iou_thr, neg_iou_thr, min_pos_iou=0.0,
                 gt_max_assign_all=True, ignore_iof_thr=-1,
                 ignore_wrt_candidates=True, match_low_quality=True,
                 gpu_assign_thr=-1):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.ignore_wrt_candidates = ignore_wrt_candidates
        self.match_low_quality = match_low_quality

    def assign(self, bboxes, gt_bboxes, gt_valid, gt_labels=None,
               box_valid=None, gt_bboxes_ignore=None, gt_ignore_valid=None):
        """Assign gts to boxes (ref: max_iou_assigner.py:60-151).

        Args:
            bboxes: (N, 4); gt_bboxes: (G, 4) padded; gt_valid: (G,) bool.
            gt_labels: optional (G,) int.
            box_valid: optional (N,) bool; invalid boxes are force-ignored.
        Returns:
            dict(assigned_gt_inds (N,) int32, max_overlaps (N,) f32,
                 labels (N,) int32 or None)
        """
        overlaps = bbox_overlaps(gt_bboxes, bboxes)  # (G, N)
        return self.assign_from_overlaps(
            overlaps, bboxes, gt_bboxes, gt_valid, gt_labels, box_valid,
            gt_bboxes_ignore, gt_ignore_valid)

    def assign_from_overlaps(self, overlaps, bboxes, gt_bboxes, gt_valid,
                             gt_labels=None, box_valid=None,
                             gt_bboxes_ignore=None, gt_ignore_valid=None):
        overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

        if self.ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
            if self.ignore_wrt_candidates:
                iof = bbox_overlaps(bboxes, gt_bboxes_ignore, mode='iof')
                if gt_ignore_valid is not None:
                    iof = jnp.where(gt_ignore_valid[None, :], iof, -1.0)
                ignore_max = iof.max(axis=1)
            else:
                iof = bbox_overlaps(gt_bboxes_ignore, bboxes, mode='iof')
                if gt_ignore_valid is not None:
                    iof = jnp.where(gt_ignore_valid[:, None], iof, -1.0)
                ignore_max = iof.max(axis=0)
            ignored = ignore_max > self.ignore_iof_thr
            overlaps = jnp.where(ignored[None, :], -1.0, overlaps)
        else:
            ignored = None

        max_overlaps = overlaps.max(axis=0)          # (N,)
        argmax_overlaps = overlaps.argmax(axis=0)    # (N,)
        # For the negative test, padded/invalid gts must look like overlap 0
        # (not -1): an image with zero valid gts has all-negative anchors in
        # the reference, not all-ignore.
        neg_overlaps = jnp.where(gt_valid[:, None], overlaps, 0.0).max(axis=0)

        # start as ignore (-1)
        assigned = jnp.full(bboxes.shape[:1], -1, jnp.int32)
        # negatives
        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            neg = (neg_overlaps >= lo) & (neg_overlaps < hi)
        else:
            neg = (neg_overlaps >= 0) & (neg_overlaps < self.neg_iou_thr)
        assigned = jnp.where(neg, 0, assigned)
        # positives
        pos = max_overlaps >= self.pos_iou_thr
        assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1,
                             assigned)

        if self.match_low_quality:
            # per-gt best anchors (ref :131-148); iterate gts in order —
            # later gt overwrites, so take the max gt index per box
            gt_max = overlaps.max(axis=1, keepdims=True)  # (G, 1)
            is_best = (overlaps == gt_max) & (gt_max >= self.min_pos_iou) \
                & gt_valid[:, None]
            if not self.gt_max_assign_all:
                # only the single argmax anchor per gt
                gt_argmax = overlaps.argmax(axis=1)
                only = jnp.zeros_like(is_best).at[
                    jnp.arange(overlaps.shape[0]), gt_argmax].set(True)
                is_best = is_best & only
            gt_ids = jnp.arange(1, overlaps.shape[0] + 1,
                                dtype=jnp.int32)[:, None]
            lq = jnp.max(jnp.where(is_best, gt_ids, 0), axis=0)
            assigned = jnp.where(lq > 0, lq, assigned)

        if ignored is not None:
            assigned = jnp.where(ignored, -1, assigned)
        if box_valid is not None:
            assigned = jnp.where(box_valid, assigned, -1)

        labels = None
        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
            labels = jnp.where(assigned > 0, take_rows(gt_labels, safe), -1)
            labels = labels.astype(jnp.int32)
        return dict(assigned_gt_inds=assigned, max_overlaps=max_overlaps,
                    labels=labels)


@BBOX_ASSIGNERS.register_module()
class ApproxMaxIoUAssigner(MaxIoUAssigner):
    """Assign gts to squares via the max IoU over each square's octave of
    approx anchors (ref: core/bbox/assigners/approx_max_iou_assigner.py;
    used by GuidedAnchorHead's shape branch).
    """

    def assign(self, approxs, squares, approxs_per_octave, gt_bboxes,
               gt_valid, gt_labels=None, box_valid=None,
               gt_bboxes_ignore=None, gt_ignore_valid=None):
        """approxs: (N * approxs_per_octave, 4) ordered per-location
        (the per-location octave is contiguous); squares: (N, 4)."""
        n = squares.shape[0]
        all_overlaps = bbox_overlaps(approxs, gt_bboxes)  # (N*k, G)
        overlaps = all_overlaps.reshape(
            n, approxs_per_octave, -1).max(axis=1).T     # (G, N)
        return self.assign_from_overlaps(
            overlaps, squares, gt_bboxes, gt_valid, gt_labels, box_valid,
            gt_bboxes_ignore, gt_ignore_valid)


def scale_boxes(bboxes, scale):
    """Expand boxes around their center (ref:
    core/bbox/assigners/center_region_assigner.py:9-33)."""
    cx = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
    cy = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
    wh = (bboxes[..., 2] - bboxes[..., 0]) * 0.5 * scale
    hh = (bboxes[..., 3] - bboxes[..., 1]) * 0.5 * scale
    return jnp.stack([cx - wh, cy - hh, cx + wh, cy + hh], axis=-1)


@BBOX_ASSIGNERS.register_module()
class CenterRegionAssigner:
    """Assign pixels in the scaled center region of a gt as positive
    (ref: core/bbox/assigners/center_region_assigner.py:71-322; used by FSAF).

    Static-shape version: shadowed (anchor, gt) pairs are returned as a
    dense (N, G) bool matrix instead of a dynamic index list.
    """

    def __init__(self, pos_scale, neg_scale, min_pos_iof=1e-2,
                 ignore_gt_scale=0.5, iou_calculator=None):
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale
        self.min_pos_iof = min_pos_iof
        self.ignore_gt_scale = ignore_gt_scale

    def assign(self, bboxes, gt_bboxes, gt_valid, gt_labels=None,
               box_valid=None, gt_bboxes_ignore=None, gt_ignore_valid=None):
        """Returns dict(assigned_gt_inds (N,), labels (N,),
        shadowed_mat (N, G) bool)."""
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        gt_core = scale_boxes(gt_bboxes, self.pos_scale)
        gt_shadow = scale_boxes(gt_bboxes, self.neg_scale)

        centers = (bboxes[:, 2:4] + bboxes[:, 0:2]) * 0.5
        in_gt = ((centers[:, 0:1] > gt_bboxes[None, :, 0])
                 & (centers[:, 0:1] < gt_bboxes[None, :, 2])
                 & (centers[:, 1:2] > gt_bboxes[None, :, 1])
                 & (centers[:, 1:2] < gt_bboxes[None, :, 3]))
        core_iof = bbox_overlaps(bboxes, gt_core, mode='iof')
        in_core = in_gt & (core_iof > self.min_pos_iof) & gt_valid[None, :]
        shadow_iof = bbox_overlaps(bboxes, gt_shadow, mode='iof')
        in_shadow = (shadow_iof > self.min_pos_iof) & gt_valid[None, :] \
            & (~in_core)

        # gt priority: the reference uses argsort(areas, descending) values
        # directly as priorities (ref :103-119); replicate exactly. Invalid
        # gts get area -inf so they sort last.
        areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) \
            * (gt_bboxes[:, 3] - gt_bboxes[:, 1])
        areas = jnp.where(gt_valid, areas, -jnp.inf)
        priority = jnp.argsort(-areas).astype(jnp.int32)  # (G,)
        pair_pri = jnp.where(in_core, priority[None, :], -1)
        best_g = pair_pri.argmax(axis=1).astype(jnp.int32)
        matched = in_core.any(axis=1)
        assigned = jnp.where(matched, best_g + 1, 0)

        # core matches not chosen become shadowed too (ref :310-317)
        chosen = jnp.zeros((n, g), bool).at[jnp.arange(n), best_g].set(
            matched)
        shadowed = in_shadow | (in_core & ~chosen)

        if gt_bboxes_ignore is not None and self.ignore_gt_scale is not None:
            ig = scale_boxes(gt_bboxes_ignore, self.ignore_gt_scale)
            in_ig = ((centers[:, 0:1] > ig[None, :, 0])
                     & (centers[:, 0:1] < ig[None, :, 2])
                     & (centers[:, 1:2] > ig[None, :, 1])
                     & (centers[:, 1:2] < ig[None, :, 3]))
            if gt_ignore_valid is not None:
                in_ig = in_ig & gt_ignore_valid[None, :]
            assigned = jnp.where(in_ig.any(axis=1), -1, assigned)

        labels = None
        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, g - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe],
                               -1).astype(jnp.int32)
            # NOTE: the reference's "positive and shadowed with the same
            # class -> shadow wins" override (ref :234-238) is applied by
            # FSAFHead from shadowed_mat, where the class count is known.
        if box_valid is not None:
            assigned = jnp.where(box_valid, assigned, -1)
            shadowed = shadowed & box_valid[:, None]
        return dict(assigned_gt_inds=assigned.astype(jnp.int32),
                    labels=labels, shadowed_mat=shadowed)


@BBOX_ASSIGNERS.register_module()
class PointAssigner:
    """Assign gts to points (ref: core/bbox/assigners/point_assigner.py:9-134;
    used by RepPoints' init stage).

    A point is positive for a gt if it is among the gt's ``pos_num`` closest
    points on the gt's pyramid level; conflicts resolve to the closest gt
    (the reference's sequential strictly-closer updates mean the earliest gt
    wins ties, which argmin reproduces).
    """
    INF = 1e8

    def __init__(self, scale=4, pos_num=3):
        self.scale = scale
        self.pos_num = pos_num

    def assign(self, points, gt_bboxes, gt_valid, gt_labels=None,
               box_valid=None):
        """Args: points (N, 3) = (x, y, stride); gt_bboxes (G, 4) padded."""
        n = points.shape[0]
        g = gt_bboxes.shape[0]
        xy = points[:, :2]
        lvl = jnp.log2(points[:, 2]).astype(jnp.int32)            # (N,)
        lvl_min = lvl.min()
        lvl_max = lvl.max()

        gt_xy = (gt_bboxes[:, :2] + gt_bboxes[:, 2:4]) / 2
        gt_wh = jnp.clip(gt_bboxes[:, 2:4] - gt_bboxes[:, :2], 1e-6, None)
        gt_lvl = ((jnp.log2(gt_wh[:, 0] / self.scale)
                   + jnp.log2(gt_wh[:, 1] / self.scale)) / 2).astype(
                       jnp.int32)
        gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

        dist = jnp.linalg.norm(
            (xy[:, None, :] - gt_xy[None, :, :]) / gt_wh[None, :, :],
            axis=-1)                                              # (N, G)
        same_lvl = lvl[:, None] == gt_lvl[None, :]
        dist = jnp.where(same_lvl & gt_valid[None, :], dist, self.INF)
        if box_valid is not None:
            dist = jnp.where(box_valid[:, None], dist, self.INF)

        # strict per-gt rank (stable: ties keep earlier point, matching the
        # reference's topk picking exactly pos_num points)
        order = jnp.argsort(dist, axis=0, stable=True)            # (N, G)
        rank = jnp.zeros_like(order).at[
            order, jnp.arange(g)[None, :]].set(
            jnp.broadcast_to(jnp.arange(n)[:, None], (n, g)))
        cand = (rank < self.pos_num) & (dist < self.INF)
        cand_dist = jnp.where(cand, dist, self.INF)
        best = cand_dist.argmin(axis=1).astype(jnp.int32)
        matched = cand_dist.min(axis=1) < self.INF
        assigned = jnp.where(matched, best + 1, 0)

        labels = None
        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, g - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe],
                               -1).astype(jnp.int32)
        return dict(assigned_gt_inds=assigned.astype(jnp.int32),
                    labels=labels)


@BBOX_ASSIGNERS.register_module()
class ATSSAssigner:
    """Adaptive Training Sample Selection
    (ref: core/bbox/assigners/atss_assigner.py:10-167).

    Per gt: top-k closest anchor centers per level are candidates; the IoU
    threshold is mean+std of candidate IoUs; positives must also have their
    anchor center inside the gt. Conflicts resolve to the highest IoU.
    """
    INF = 1e8

    def __init__(self, topk, iou_calculator=None):
        self.topk = topk

    def assign(self, bboxes, num_level_bboxes, gt_bboxes, gt_valid,
               gt_labels=None, box_valid=None):
        n = bboxes.shape[0]
        g = gt_bboxes.shape[0]
        overlaps = bbox_overlaps(bboxes, gt_bboxes)  # (N, G)

        gt_c = (gt_bboxes[:, :2] + gt_bboxes[:, 2:4]) * 0.5  # (G, 2)
        bc = (bboxes[:, :2] + bboxes[:, 2:4]) * 0.5          # (N, 2)
        distances = jnp.sqrt(
            ((bc[:, None, :] - gt_c[None, :, :]) ** 2).sum(-1))
        if box_valid is not None:
            distances = jnp.where(box_valid[:, None], distances, self.INF)

        # top-k closest candidates per level (static level slices)
        cand_rows = []
        start = 0
        for nl in num_level_bboxes:
            d = distances[start:start + nl]                  # (nl, G)
            k = min(self.topk, nl)
            _, idx = jax.lax.top_k(-d.T, k)                  # (G, k)
            cand_rows.append(idx.T + start)                  # (k, G)
            start += nl
        cand = jnp.concatenate(cand_rows, axis=0)            # (K, G)

        cand_ious = jnp.take_along_axis(overlaps, cand, axis=0)  # (K, G)
        mean = cand_ious.mean(axis=0)
        # torch.std default is Bessel-corrected (unbiased)
        kk = cand_ious.shape[0]
        std = jnp.sqrt(((cand_ious - mean) ** 2).sum(0) / max(kk - 1, 1))
        thr = mean + std                                     # (G,)
        is_pos = cand_ious >= thr[None, :]

        # candidate centers must lie inside the gt (ref :136-143)
        cx = bc[:, 0][cand]                                  # (K, G)
        cy = bc[:, 1][cand]
        l_ = cx - gt_bboxes[None, :, 0]
        t_ = cy - gt_bboxes[None, :, 1]
        r_ = gt_bboxes[None, :, 2] - cx
        b_ = gt_bboxes[None, :, 3] - cy
        inside = jnp.minimum(jnp.minimum(l_, t_), jnp.minimum(r_, b_)) > 0.01
        is_pos = is_pos & inside & gt_valid[None, :]
        if box_valid is not None:
            is_pos = is_pos & box_valid[cand]

        # scatter candidate positivity back to the dense (N, G) grid, then
        # resolve multi-gt anchors by max IoU (ref :145-155)
        pos_mat = jnp.zeros((n, g), bool).at[
            cand, jnp.arange(g)[None, :]].max(is_pos)
        ovl = jnp.where(pos_mat, overlaps, -self.INF)
        max_o = ovl.max(axis=1)
        arg_g = ovl.argmax(axis=1).astype(jnp.int32)
        assigned = jnp.where(max_o > -self.INF, arg_g + 1, 0)

        labels = None
        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, g - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe],
                               -1).astype(jnp.int32)
        return dict(assigned_gt_inds=assigned.astype(jnp.int32),
                    max_overlaps=max_o, labels=labels)

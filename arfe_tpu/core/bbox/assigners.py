"""Assigners (static, mask-based).

TPU-native counterpart of ref: mmdet/core/bbox/assigners/max_iou_assigner.py.
Instead of dynamic-shape index lists, everything is computed over padded
arrays with validity masks: ground-truth boxes come as (G_max, 4) with a
``gt_valid`` mask, anchors/proposals as (N, 4) with an optional validity
mask. The result is a per-box ``assigned_gt_inds`` in the reference's
encoding: -1 = ignore, 0 = negative, k > 0 = matched to gt k-1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...registry import BBOX_ASSIGNERS
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
            labels = jnp.where(assigned > 0, gt_labels[safe], -1)
            labels = labels.astype(jnp.int32)
        return dict(assigned_gt_inds=assigned, max_overlaps=max_overlaps,
                    labels=labels)

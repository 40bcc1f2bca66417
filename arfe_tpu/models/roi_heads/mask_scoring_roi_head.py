"""Mask Scoring R-CNN RoI head (ref:
mmdet/models/roi_heads/mask_scoring_roi_head.py:8-81).

Adds a MaskIoUHead on top of the standard mask branch; at train time the
IoU target is IoU(binarized predicted mask, gt mask) with the gt's
out-of-box area recovered via an area ratio. With our fixed-size gt crops
the ratio is computed analytically: gt-in-roi area = target_mean*roi_area,
full gt area = crop_mean*gt_box_area (the crop is the gt mask resampled
over its own box).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...layers import take_rows
from ...registry import HEADS
from ..builder import build_head
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class MaskScoringRoIHead(StandardRoIHead):
    def __init__(self, mask_iou_head, **kwargs):
        assert mask_iou_head is not None
        super().__init__(**kwargs)
        self.mask_iou_head = build_head(mask_iou_head)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init(k1)
        p['mask_iou_head'] = self.mask_iou_head.init(k2)
        return p

    def _mask_forward_train(self, params, feats, rois, sampled,
                            gt_mask_crops):
        from ...core.mask.mask_target import mask_target_from_crops

        assert gt_mask_crops is not None, \
            'mask training requires gt_mask_crops in the batch'
        b, s = sampled['boxes'].shape[:2]
        # positives-only mask branch (see StandardRoIHead._mask_forward_
        # train: the sampler packs positives into the leading slots)
        if hasattr(self.sampler, 'num') and hasattr(self.sampler,
                                                    'pos_fraction'):
            cap = min(s, int(self.sampler.num * self.sampler.pos_fraction))
            rois = rois.reshape(b, s, 5)[:, :cap].reshape(b * cap, 5)
            sampled = {k: (v[:, :cap] if v.ndim >= 2 and v.shape[1] == s
                           else v) for k, v in sampled.items()}
            s = cap
        mask_feats = self.mask_roi_extractor(
            {}, feats[:self.mask_roi_extractor.num_inputs], rois)
        mask_pred = self.mask_head(params['mask_head'], mask_feats)
        m = mask_pred.shape[1]

        def tgt_one(crops, gt_inds, gt_boxes, boxes):
            return mask_target_from_crops(take_rows(crops, gt_inds),
                                          gt_boxes, boxes,
                                          mask_size=m)

        targets = jax.vmap(tgt_one)(gt_mask_crops, sampled['gt_inds'],
                                    sampled['gt_boxes'], sampled['boxes'])
        targets = targets.reshape(b * s, m, m)
        labels = sampled['labels'].reshape(b * s)
        pos = (sampled['is_pos'] & sampled['valid']).reshape(b * s)
        losses = self.mask_head.loss(mask_pred, targets, labels, pos)

        # ---- mask IoU branch (ref: mask_scoring_roi_head.py:25-48) ----
        safe_lbl = jnp.clip(labels, 0, mask_pred.shape[-1] - 1)
        cls_mask = jnp.take_along_axis(
            mask_pred, safe_lbl[:, None, None, None], axis=-1)[..., 0]
        mask_iou_pred = self.mask_iou_head(params['mask_iou_head'],
                                           mask_feats, cls_mask)
        pos_iou_pred = jnp.take_along_axis(
            mask_iou_pred, safe_lbl[:, None], axis=1)[:, 0]

        thr = (self.train_cfg or {}).get('mask_thr_binary', 0.5)
        bin_pred = (jax.nn.sigmoid(cls_mask.astype(jnp.float32)) > thr) \
            .astype(jnp.float32)
        pred_area = bin_pred.sum((-1, -2))
        overlap = (bin_pred * targets).sum((-1, -2))
        # area ratio via the analytic crop means (see module docstring)
        boxes = sampled['boxes'].reshape(b * s, 4)
        gt_boxes = sampled['gt_boxes'].reshape(b * s, 4)
        roi_area = jnp.maximum((boxes[:, 2] - boxes[:, 0])
                               * (boxes[:, 3] - boxes[:, 1]), 1e-2)
        gt_area = jnp.maximum((gt_boxes[:, 2] - gt_boxes[:, 0])
                              * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-2)
        crop_mean = jax.vmap(
            lambda crops, gi: take_rows(crops, gi).mean((-1, -2)))(
            gt_mask_crops, sampled['gt_inds']).reshape(b * s)
        gt_in_roi = targets.mean((-1, -2)) * roi_area
        gt_full_px = crop_mean * gt_area
        ratio = gt_in_roi / (gt_full_px + 1e-7)
        gt_full = targets.sum((-1, -2)) / jnp.maximum(ratio, 1e-7)
        iou_tgt = overlap / jnp.maximum(pred_area + gt_full - overlap, 1e-7)
        iou_tgt = jnp.where(pos, iou_tgt, 0.0)
        losses.update(self.mask_iou_head.loss(pos_iou_pred, iou_tgt, pos))
        return losses

    def simple_test(self, params, feats, proposals, proposal_valid,
                    img_shapes, scale_factors, rescale=False):
        """Returns (dets, labels, valid, mask_logits, mask_scores) where
        mask_scores = bbox_score * predicted mask IoU
        (ref :50-81 get_mask_scores)."""
        dets, labels, valid = self.simple_test_bboxes(
            params, feats, proposals, proposal_valid, img_shapes,
            scale_factors, rescale=rescale)
        if not self.with_mask:
            return dets, labels, valid
        masks = self.simple_test_mask(params, feats, dets, labels, valid,
                                      img_shapes, scale_factors,
                                      rescale=rescale)
        # recompute mask feats at detection boxes for the IoU head
        b, n, _ = dets.shape
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * scale_factors[:, None, :4]
        binds = jnp.broadcast_to(
            jnp.arange(b, dtype=boxes.dtype)[:, None], (b, n))
        rois = jnp.concatenate([binds[..., None], boxes],
                               axis=-1).reshape(b * n, 5)
        mask_feats = self.mask_roi_extractor(
            {}, feats[:self.mask_roi_extractor.num_inputs], rois)
        flat_masks = masks.reshape((b * n,) + masks.shape[2:])
        iou_pred = self.mask_iou_head(params['mask_iou_head'], mask_feats,
                                      flat_masks)
        lbl = labels.reshape(b * n)
        iou = jnp.take_along_axis(
            iou_pred, jnp.clip(lbl, 0, self.mask_iou_head.num_classes - 1)
            [:, None], axis=1)[:, 0].reshape(b, n)
        mask_scores = dets[..., 4] * iou
        return dets, labels, valid, masks, mask_scores

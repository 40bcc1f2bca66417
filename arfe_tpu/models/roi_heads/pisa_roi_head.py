"""PISA RoI head (ref: mmdet/models/roi_heads/pisa_roi_head.py:11-158).

StandardRoIHead whose bbox loss applies ISR-P positive reweighting and the
CARL term. ISR-N (negative reweighting) comes from pairing with the
ScoreHLRSampler in the config, as in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import HEADS
from ..losses.pisa_loss import carl_loss, isr_p
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class PISARoIHead(StandardRoIHead):
    def forward_train(self, params, feats, proposals, prop_valid, gt_bboxes,
                      gt_valid, gt_labels, key, gt_mask_crops=None,
                      img_shapes=None):
        b = proposals.shape[0]
        sampled = self._sample_for_train(params, feats, proposals,
                                         prop_valid, gt_bboxes, gt_valid,
                                         gt_labels, key)
        s = sampled['boxes'].shape[1]
        batch_inds = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.float32)[:, None], (b, s))
        rois = jnp.concatenate(
            [batch_inds[..., None], sampled['boxes']], -1).reshape(b * s, 5)
        out = self._bbox_forward(params, feats, rois, num_imgs=b)
        cls_score, bbox_pred = out[0], out[1]

        pos_weight = self.train_cfg.get('pos_weight', -1) \
            if self.train_cfg else -1

        def tgt(boxes, gts, labels, is_pos, valid):
            return self.bbox_head.get_targets(boxes, gts, labels, is_pos,
                                              valid, pos_weight)

        labels, label_weights, bbox_targets, bbox_weights = jax.vmap(tgt)(
            sampled['boxes'], sampled['gt_boxes'], sampled['labels'],
            sampled['is_pos'], sampled['valid'])
        labels = labels.reshape(-1)
        label_weights = label_weights.reshape(-1)
        bbox_targets = bbox_targets.reshape(-1, 4)
        bbox_weights = bbox_weights.reshape(-1, 4)

        g = gt_bboxes.shape[1]
        img_off = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * g, s)
        gt_inds = sampled['gt_inds'].reshape(-1).astype(jnp.int32) + img_off
        nc = self.bbox_head.num_classes

        isr_cfg = self.train_cfg.get('isr', None)
        if isr_cfg is not None:
            label_weights = isr_p(
                cls_score.astype(jnp.float32),
                bbox_pred.astype(jnp.float32), labels, label_weights,
                bbox_targets, bbox_weights, rois, gt_inds,
                self.bbox_head.loss_cls, self.bbox_head.bbox_coder,
                k=isr_cfg.get('k', 2), bias=isr_cfg.get('bias', 0),
                num_class=nc, num_gt_groups=b * g)

        losses = self.bbox_head.loss(cls_score, bbox_pred, labels,
                                     label_weights, bbox_targets,
                                     bbox_weights)

        carl_cfg = self.train_cfg.get('carl', None)
        if carl_cfg is not None:
            num_pos = ((sampled['is_pos'] & sampled['valid'])
                       .sum().astype(jnp.float32))
            losses.update(carl_loss(
                cls_score.astype(jnp.float32), labels,
                bbox_pred.astype(jnp.float32), bbox_targets,
                self.bbox_head.loss_bbox, k=carl_cfg.get('k', 1),
                bias=carl_cfg.get('bias', 0.2),
                avg_factor=jnp.maximum(num_pos, 1.0), sigmoid=False,
                num_class=nc, valid=label_weights > 0))
        if self.with_mask:
            losses.update(self._mask_forward_train(
                params, feats, rois, sampled, gt_mask_crops))
        return losses

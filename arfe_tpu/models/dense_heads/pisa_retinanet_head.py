"""PISA heads: PISARetinaHead, PISASSDHead
(ref: mmdet/models/dense_heads/pisa_retinanet_head.py:9-150,
pisa_ssd_head.py:10-139).

Same structures as their parents; the loss applies ISR-P positive
reweighting and adds the CARL regression term (see losses/pisa_loss.py for
the static group-ranking rewrite).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS
from ..losses.cross_entropy_loss import cross_entropy
from ..losses.pisa_loss import carl_loss, isr_p
from ..losses.smooth_l1_loss import smooth_l1_loss
from .retina_head import RetinaHead
from .ssd_head import SSDHead


@HEADS.register_module()
class PISARetinaHead(RetinaHead):
    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        b = cls_scores[0].shape[0]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        anchors = jnp.asarray(np.concatenate(mlvl_anchors, axis=0))
        pad_shape = (featmap_sizes[0][0] * self.anchor_generator.strides[0][0],
                     featmap_sizes[0][1] * self.anchor_generator.strides[0][1])
        flags = jnp.asarray(np.concatenate(
            self.anchor_generator.valid_flags(featmap_sizes, pad_shape)))

        keys = jax.random.split(key, b)

        def tgt(k, gb, gv, gl, shape):
            return self._targets_single(k, anchors, flags, gb, gv, gl, shape)

        (labels, label_weights, bbox_targets, bbox_weights, npos, nneg,
         pos_gt_inds) = jax.vmap(tgt)(keys, gt_bboxes, gt_valid, gt_labels,
                                      img_shapes)
        num_total_pos = jnp.maximum(npos, 1).sum()
        num_total_neg = jnp.maximum(nneg, 1).sum()
        num_total = (num_total_pos + num_total_neg if self.sampling
                     else num_total_pos).astype(jnp.float32)

        n = anchors.shape[0]
        g = gt_bboxes.shape[1]
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1).reshape(-1, self.cls_out_channels)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1).reshape(-1, 4)
        labels = labels.reshape(-1)
        label_weights = label_weights.reshape(-1)
        bbox_targets = bbox_targets.reshape(-1, 4)
        bbox_weights = bbox_weights.reshape(-1, 4)
        # globally-unique gt group ids: img * G + gt
        img_off = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * g, n)
        gt_inds = pos_gt_inds.reshape(-1) + img_off
        anchors_rep = jnp.tile(anchors, (b, 1))

        isr_cfg = self.train_cfg.get('isr', None)
        if isr_cfg is not None:
            label_weights = isr_p(
                cls_flat, box_flat, labels, label_weights, bbox_targets,
                bbox_weights, anchors_rep, gt_inds, self.loss_cls,
                self.bbox_coder, k=isr_cfg.get('k', 2),
                bias=isr_cfg.get('bias', 0), num_class=self.num_classes,
                num_gt_groups=b * g)

        loss_cls = self.loss_cls(cls_flat, labels, label_weights,
                                 avg_factor=num_total)
        loss_bbox = self.loss_bbox(box_flat, bbox_targets, bbox_weights,
                                   avg_factor=num_total)
        losses = dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

        carl_cfg = self.train_cfg.get('carl', None)
        if carl_cfg is not None:
            losses.update(carl_loss(
                cls_flat, labels, box_flat, bbox_targets, self.loss_bbox,
                k=carl_cfg.get('k', 1), bias=carl_cfg.get('bias', 0.2),
                avg_factor=num_total_pos.astype(jnp.float32), sigmoid=True,
                num_class=self.num_classes,
                valid=label_weights > 0))
        return losses


@HEADS.register_module()
class PISASSDHead(SSDHead):
    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key):
        from ...registry import LOSSES, build_from_cfg
        cfg = self.train_cfg
        neg_pos_ratio = cfg.get('neg_pos_ratio', 3)
        smoothl1_beta = cfg.get('smoothl1_beta', 1.0)
        b = cls_scores[0].shape[0]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        anchors = jnp.asarray(np.concatenate(mlvl_anchors, axis=0))
        flags = jnp.ones((anchors.shape[0],), bool)
        keys = jax.random.split(key, b)

        def tgt(k, gb, gv, gl, shape):
            return self._targets_single(k, anchors, flags, gb, gv, gl, shape)

        (labels, label_weights, bbox_targets, bbox_weights, npos, nneg,
         pos_gt_inds) = jax.vmap(tgt)(keys, gt_bboxes, gt_valid, gt_labels,
                                      img_shapes)

        n = anchors.shape[0]
        g = gt_bboxes.shape[1]
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        flat_labels = labels.reshape(-1)
        flat_lw = label_weights.reshape(-1)
        flat_bt = bbox_targets.reshape(-1, 4)
        flat_bw = bbox_weights.reshape(-1, 4)
        img_off = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * g, n)
        gt_inds = pos_gt_inds.reshape(-1) + img_off
        anchors_rep = jnp.tile(anchors, (b, 1))

        isr_cfg = cfg.get('isr', None)
        if isr_cfg is not None:
            # ref uses a plain CE loss inside ISR for SSD
            ce_loss = build_from_cfg(dict(type='CrossEntropyLoss'), LOSSES)
            flat_lw = isr_p(
                cls_flat.reshape(-1, self.cls_out_channels).astype(
                    jnp.float32),
                box_flat.reshape(-1, 4).astype(jnp.float32),
                flat_labels, flat_lw, flat_bt, flat_bw, anchors_rep,
                gt_inds, ce_loss, self.bbox_coder,
                k=isr_cfg.get('k', 2), bias=isr_cfg.get('bias', 0),
                num_class=self.num_classes, num_gt_groups=b * g)
            label_weights = flat_lw.reshape(b, n)

        def loss_one(cs, bp, lab, lw, bt, bw, np_):
            ce = cross_entropy(cs, lab, reduction='none')
            pos = (lab >= 0) & (lab < self.num_classes) & (lw > 0)
            neg = (lab == self.background_label) & (lw > 0)
            neg_loss = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_loss)
            rank = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0]))
            num_neg = neg_pos_ratio * jnp.maximum(np_, 1)
            keep_neg = neg & (rank < num_neg)
            w = (pos | keep_neg).astype(jnp.float32) * lw
            denom = jnp.maximum(np_, 1).astype(jnp.float32)
            loss_cls = (ce * w).sum() / denom
            l1 = smooth_l1_loss(bp, bt, beta=smoothl1_beta)
            loss_bbox = (l1 * bw).sum() / denom
            return loss_cls, loss_bbox

        lc, lb = jax.vmap(loss_one)(cls_flat, box_flat, labels,
                                    label_weights, bbox_targets,
                                    bbox_weights, npos)
        losses = dict(loss_cls=lc.mean(), loss_bbox=lb.mean())

        carl_cfg = cfg.get('carl', None)
        if carl_cfg is not None:
            from ..losses.smooth_l1_loss import SmoothL1Loss
            num_total_pos = jnp.maximum(npos, 1).sum().astype(jnp.float32)
            losses.update(carl_loss(
                cls_flat.reshape(-1, self.cls_out_channels).astype(
                    jnp.float32),
                flat_labels, box_flat.reshape(-1, 4).astype(jnp.float32),
                flat_bt, SmoothL1Loss(beta=1.0),
                k=carl_cfg.get('k', 1), bias=carl_cfg.get('bias', 0.2),
                avg_factor=num_total_pos, sigmoid=False,
                num_class=self.num_classes, valid=flat_lw > 0))
        return losses

"""FreeAnchor retina head
(ref: mmdet/models/dense_heads/free_anchor_retina_head.py:9-181).

Learning-to-match: each gt owns a "bag" of its top-k IoU anchors; the
positive loss is -alpha*log(mean-max P_cls*P_loc) over the bag, the
negative loss is a focal-weighted BCE on cls_prob*(1 - P{anchor in A+}).

TPU-native departures:
- the reference's sparse-tensor max over (gt, class) pairs becomes a
  ``segment_max`` over gt labels (invalid/padded gts routed to a dump
  segment) — identical dense result, static shape.
- everything is batched with vmap over images; padded gts are masked out
  of both bags and num_pos.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.iou import bbox_overlaps
from ...registry import HEADS
from .retina_head import RetinaHead


@HEADS.register_module()
class FreeAnchorRetinaHead(RetinaHead):
    def __init__(self, num_classes, in_channels, stacked_convs=4,
                 conv_cfg=None, norm_cfg=None, pre_anchor_topk=50,
                 bbox_thr=0.6, gamma=2.0, alpha=0.5, **kwargs):
        super().__init__(num_classes, in_channels, stacked_convs,
                         conv_cfg, norm_cfg, **kwargs)
        self.pre_anchor_topk = pre_anchor_topk
        self.bbox_thr = bbox_thr
        self.gamma = gamma
        self.alpha = alpha

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key=None):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        b = cls_scores[0].shape[0]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        anchors = jnp.asarray(np.concatenate(
            self.anchor_generator.grid_anchors(featmap_sizes), axis=0))
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores], 1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        cls_prob = jax.nn.sigmoid(cls_flat)

        C = self.cls_out_channels
        k = self.pre_anchor_topk

        def per_image(cls_prob_, bbox_preds_, gtb, gv, gl):
            # ---- P{a_j in A+} (ref: free_anchor_retina_head.py:66-119) ----
            pred_boxes = jax.lax.stop_gradient(
                self.bbox_coder.decode(anchors, bbox_preds_))
            iou = bbox_overlaps(gtb, pred_boxes)               # (G, J)
            iou = jnp.where(gv[:, None], iou, 0.0)
            t1 = self.bbox_thr
            t2 = jnp.clip(iou.max(axis=1, keepdims=True), t1 + 1e-12, None)
            obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)
            obj_box_prob = jnp.where(gv[:, None], obj_box_prob, 0.0)
            # max over gts of the same class -> (C, J); padded gts go to a
            # dump segment C
            seg = jnp.where(gv, gl, C).astype(jnp.int32)
            img_box_prob = jax.ops.segment_max(
                obj_box_prob, seg, num_segments=C + 1,
                indices_are_sorted=False)[:C]
            img_box_prob = jnp.maximum(img_box_prob, 0.0).T     # (J, C)
            img_box_prob = jax.lax.stop_gradient(img_box_prob)

            # ---- bags (ref: :121-150) ----
            qual = bbox_overlaps(gtb, anchors)                  # (G, J)
            _, matched = jax.lax.top_k(qual, k)                 # (G, k)
            m_cls_prob = jnp.take_along_axis(
                cls_prob_[matched],                             # (G, k, C)
                jnp.broadcast_to(gl[:, None, None],
                                 (gl.shape[0], k, 1)).astype(jnp.int32),
                axis=2)[..., 0]                                 # (G, k)
            m_anchors = anchors[matched]                        # (G, k, 4)
            m_targets = self.bbox_coder.encode(
                m_anchors, jnp.broadcast_to(gtb[:, None, :], m_anchors.shape))
            lb = self.loss_bbox(bbox_preds_[matched], m_targets,
                                reduction_override='none').sum(-1)
            m_box_prob = jnp.exp(-lb)                           # (G, k)

            # positive bag loss (ref: :167-175)
            m_prob = m_cls_prob * m_box_prob
            wgt = 1.0 / jnp.clip(1.0 - m_prob, 1e-12, None)
            wgt = wgt / wgt.sum(axis=1, keepdims=True)
            bag_prob = (wgt * m_prob).sum(axis=1)
            pos_loss = self.alpha * -jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
            pos_loss = jnp.where(gv, pos_loss, 0.0).sum()

            # negative bag loss (ref: :177-181)
            prob = cls_prob_ * (1 - img_box_prob)
            neg = (1 - self.alpha) * prob ** self.gamma * \
                -jnp.log(jnp.clip(1 - prob, 1e-12, 1.0))
            return pos_loss, neg.sum(), gv.sum()

        pos_loss, neg_loss, npos = jax.vmap(per_image)(
            cls_prob, box_flat, gt_bboxes, gt_valid, gt_labels)
        num_pos = jnp.maximum(npos.sum(), 1).astype(jnp.float32)
        return {
            'positive_bag_loss': pos_loss.sum() / num_pos,
            'negative_bag_loss':
                neg_loss.sum() / (num_pos * self.pre_anchor_topk),
        }

"""FSAF head (ref: mmdet/models/dense_heads/fsaf_head.py:12-380).

Anchor-free RetinaNet-style head with online feature-level selection: per-gt
losses are collected per FPN level and each gt back-propagates only through
its min-loss level. Static-shape rewrite: the reference's dynamic per-gt
index lists become one-hot (anchor, gt) matrices reduced per static level
slice; the running gt->level histogram that the reference writes to
``./gt_assign.txt`` inside the loss (ref :240-247) is returned as a
``gt_assign_hist`` aux array, which the train loop accumulates and writes
(file IO cannot live inside jit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS
from ..layers import Conv2d, take_rows
from .anchor_head import anchor_inside_flags
from .retina_head import RetinaHead


@HEADS.register_module()
class FSAFHead(RetinaHead):
    def __init__(self, num_classes, in_channels, stacked_convs=4,
                 anchor_generator=None, **kwargs):
        anchor_generator = anchor_generator or dict(
            type='AnchorGenerator', octave_base_scale=1, scales_per_octave=1,
            ratios=[1.0], strides=[8, 16, 32, 64, 128])
        kwargs.setdefault('reg_decoded_bbox', True)
        kwargs.setdefault('bbox_coder', dict(type='TBLRBBoxCoder',
                                             normalizer=4.0))
        super().__init__(num_classes, in_channels,
                         stacked_convs=stacked_convs,
                         anchor_generator=anchor_generator, **kwargs)

    def _init_layers(self):
        super()._init_layers()
        # positive bias prevents zero-area predicted boxes
        # (ref: fsaf_head.py:37-41)
        self.retina_reg = Conv2d(self.feat_channels, self.num_anchors * 4, 3,
                                 padding=1, weight_init='normal',
                                 init_std=0.01, bias_value=0.25)

    # the relu on bbox_pred below is not expressible as bare finals
    cm_finals = False

    def forward_single(self, params, x):
        cls_score, bbox_pred = super().forward_single(params, x)
        # TBLR coder only accepts positive distances (ref :32-35)
        return cls_score, jax.nn.relu(bbox_pred)

    def _fsaf_targets_single(self, anchors, flags, gt_bboxes, gt_valid,
                             gt_labels, img_shape):
        """Per-image targets. Returns labels (N,), label_weights (N, C),
        bbox_targets (N, 4), bbox_weights (N,), pos_gt_inds (N,) (0-based,
        -1 = unassigned), shadow_cls (N, C) bool."""
        cfg = self.train_cfg
        n = anchors.shape[0]
        c = self.cls_out_channels
        inside = anchor_inside_flags(anchors, flags, img_shape,
                                     cfg.get('allowed_border', -1))
        res = self.assigner.assign(anchors, gt_bboxes, gt_valid, gt_labels,
                                   box_valid=inside)
        assigned = res['assigned_gt_inds']
        shadowed = res['shadowed_mat']                      # (N, G)

        # shadowed (anchor, class) channels: one-hot contraction over gts
        gt_onehot = jax.nn.one_hot(gt_labels, c, dtype=jnp.float32)  # (G, C)
        shadow_cls = (shadowed.astype(jnp.float32) @ gt_onehot) > 0  # (N, C)

        pos = assigned > 0
        safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        labels_pos = take_rows(gt_labels.astype(jnp.int32), safe)
        # "one label cannot be both positive and ignored": a positive anchor
        # shadowed for its own class flips to shadow (ref
        # center_region_assigner.py:234-238)
        own_shadow = jnp.take_along_axis(
            shadow_cls, labels_pos[:, None], axis=1)[:, 0] & pos
        pos = pos & ~own_shadow
        assigned = jnp.where(own_shadow, 0, assigned)

        labels = jnp.where(pos, labels_pos, self.background_label)
        pos_w = cfg.get('pos_weight', -1)
        pos_w = 1.0 if pos_w <= 0 else pos_w
        lw_row = jnp.where(pos, pos_w,
                           jnp.where(assigned == 0, 1.0, 0.0))
        label_weights = jnp.broadcast_to(lw_row[:, None], (n, c))
        label_weights = jnp.where(shadow_cls, 0.0, label_weights)

        bbox_targets = jnp.where(pos[:, None], take_rows(gt_bboxes, safe),
                                 jnp.zeros((n, 4), jnp.float32))
        bbox_weights = pos.astype(jnp.float32)
        pos_gt_inds = jnp.where(pos, safe, -1).astype(jnp.int32)
        num_neg = (assigned == 0).sum()
        return (labels.astype(jnp.int32), label_weights, bbox_targets,
                bbox_weights, pos_gt_inds, shadow_cls, num_neg)

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key=None):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        # avoid 0-area predicted boxes (ref :155-157)
        bbox_preds = [jnp.clip(p.astype(jnp.float32), 1e-4, None)
                      for p in bbox_preds]
        b = cls_scores[0].shape[0]
        c = self.cls_out_channels
        g = gt_bboxes.shape[1]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        num_levels = len(featmap_sizes)
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        level_sizes = [a.shape[0] for a in mlvl_anchors]
        anchors = jnp.asarray(np.concatenate(mlvl_anchors, 0))
        pad_shape = (featmap_sizes[0][0] * self.anchor_generator.strides[0][0],
                     featmap_sizes[0][1] * self.anchor_generator.strides[0][1])
        flags = jnp.asarray(np.concatenate(
            self.anchor_generator.valid_flags(featmap_sizes, pad_shape)))
        lvl_of_anchor = jnp.asarray(np.concatenate(
            [np.full(nl, i, np.int32) for i, nl in enumerate(level_sizes)]))

        def tgt(gb, gv, gl, shape):
            return self._fsaf_targets_single(anchors, flags, gb, gv, gl,
                                             shape)

        (labels, label_weights, bbox_targets, bbox_weights, pos_gt_inds,
         shadow_cls, num_neg) = jax.vmap(tgt)(gt_bboxes, gt_valid, gt_labels,
                                              img_shapes)
        num_total_neg = num_neg.sum()

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, c) for s in cls_scores], 1)       # (B, N, C)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)       # (B, N, 4)

        # element-wise losses (reduction='none' configs)
        cls_el = self.loss_cls(cls_flat.reshape(-1, c), labels.reshape(-1),
                               label_weights.reshape(-1, c),
                               reduction_override='none').reshape(b, -1, c)
        anc_b = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
        decoded = self.bbox_coder.decode(anc_b, box_flat)
        reg_el = self.loss_bbox(decoded.reshape(-1, 4),
                                bbox_targets.reshape(-1, 4),
                                bbox_weights.reshape(-1),
                                reduction_override='none').reshape(b, -1)

        # per-(gt, level) mean loss -> online level selection (ref :298-327)
        loss_anchor = cls_el.sum(-1) + reg_el                   # (B, N)
        gt_onehot = (pos_gt_inds[..., None] ==
                     jnp.arange(g)[None, None, :])              # (B, N, G)
        gt_onehot = gt_onehot & (pos_gt_inds[..., None] >= 0)
        ow = gt_onehot.astype(jnp.float32)
        lvl_losses = []
        start = 0
        for nl in level_sizes:
            sl = slice(start, start + nl)
            cnt = ow[:, sl].sum(1)                              # (B, G)
            tot = jnp.einsum('bng,bn->bg', ow[:, sl], loss_anchor[:, sl])
            lvl_losses.append(jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1),
                                        1e6))
            start += nl
        loss_levels = jnp.stack(lvl_losses, 1)                  # (B, L, G)
        min_levels = jnp.argmin(loss_levels, axis=1)            # (B, G)
        min_levels = jax.lax.stop_gradient(min_levels)

        # keep positives only at their gt's chosen level (ref :329-380)
        safe = jnp.clip(pos_gt_inds, 0, g - 1)
        chosen_lvl = jnp.take_along_axis(min_levels, safe, axis=1)  # (B, N)
        keep = (pos_gt_inds >= 0) & (chosen_lvl == lvl_of_anchor[None, :])
        dropped = (pos_gt_inds >= 0) & ~keep
        # zero only the dropped anchor's own class channel
        drop_cls = dropped[..., None] & jax.nn.one_hot(
            labels, c, dtype=bool)
        cls_el = jnp.where(drop_cls, 0.0, cls_el)
        reg_el = jnp.where(dropped, 0.0, reg_el)

        num_pos = keep.sum().astype(jnp.float32)
        avg_factor = jnp.where(num_pos > 0, num_pos,
                               num_pos + num_total_neg.astype(jnp.float32))
        loss_cls = cls_el.sum() / avg_factor
        loss_bbox = reg_el.sum() / avg_factor

        # accuracy over final positives (ref :278-296)
        pred_lbl = cls_flat.argmax(-1)
        correct = ((pred_lbl == labels) & keep).sum().astype(jnp.float32)
        acc = correct / jnp.maximum(num_pos, 1e-3)

        # gt->level assignment histogram (ref :240-247 gt_assign.txt)
        hist = (jax.nn.one_hot(min_levels, num_levels, dtype=jnp.float32)
                * gt_valid[..., None]).sum((0, 1))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    num_pos=num_pos / b, accuracy=acc,
                    gt_assign_hist=jax.lax.stop_gradient(hist))

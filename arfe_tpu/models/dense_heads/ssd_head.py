"""SSD head (ref: mmdet/models/dense_heads/ssd_head.py): per-level cls/reg
convs, softmax CE with 3:1 hard negative mining, SmoothL1 regression.
Hard negative mining is rank-based (static shapes): per image, negatives
are kept if their cls-loss rank is below 3x the positive count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS
from ..layers import Conv2d
from ..losses.cross_entropy_loss import cross_entropy
from ..losses.smooth_l1_loss import smooth_l1_loss
from .anchor_head import AnchorHead


@HEADS.register_module()
class SSDHead(AnchorHead):
    def __init__(self, num_classes=80, in_channels=(512, 1024, 512, 256,
                                                    256, 256),
                 anchor_generator=None, bbox_coder=None,
                 reg_decoded_bbox=False, background_label=None,
                 train_cfg=None, test_cfg=None):
        self.num_classes = num_classes
        self.in_channels = tuple(in_channels)
        self.cls_out_channels = num_classes + 1   # softmax with bg
        self.use_sigmoid_cls = False
        self.sampling = False
        self.background_label = num_classes
        self.reg_decoded_bbox = reg_decoded_bbox
        from ...registry import ANCHOR_GENERATORS, BBOX_CODERS, \
            build_from_cfg
        anchor_generator = anchor_generator or dict(
            type='SSDAnchorGenerator', scale_major=False, input_size=300,
            basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]])
        self.anchor_generator = build_from_cfg(anchor_generator,
                                               ANCHOR_GENERATORS)
        self.bbox_coder = build_from_cfg(
            bbox_coder or dict(type='DeltaXYWHBBoxCoder',
                               target_means=[.0, .0, .0, .0],
                               target_stds=[0.1, 0.1, 0.2, 0.2]),
            BBOX_CODERS)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        if train_cfg is not None:
            from ...registry import BBOX_ASSIGNERS, BBOX_SAMPLERS
            self.assigner = build_from_cfg(train_cfg['assigner'],
                                           BBOX_ASSIGNERS)
            self.sampler = build_from_cfg(dict(type='PseudoSampler'),
                                          BBOX_SAMPLERS)
        num_anchors = self.anchor_generator.num_base_anchors
        self.reg_convs = []
        self.cls_convs = []
        for i, (c, a) in enumerate(zip(self.in_channels, num_anchors)):
            self.reg_convs.append(Conv2d(c, a * 4, 3, padding=1))
            self.cls_convs.append(Conv2d(c, a * (num_classes + 1), 3,
                                         padding=1))

    def init(self, key):
        keys = jax.random.split(key, 2 * len(self.reg_convs))
        return {'reg_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.reg_convs)},
                'cls_convs': {
                    str(i): m.init(keys[len(self.reg_convs) + i])
                    for i, m in enumerate(self.cls_convs)}}

    def __call__(self, params, feats):
        cls_scores = []
        bbox_preds = []
        for i, f in enumerate(feats):
            # sibling cls/reg convs read the same level -> one stacked
            # conv (bit-exact; stored params stay separate)
            pc = params['cls_convs'][str(i)]
            pr = params['reg_convs'][str(i)]
            w = jnp.concatenate([pc['weight'], pr['weight']], axis=-1)
            b = jnp.concatenate([pc['bias'], pr['bias']])
            out = jax.lax.conv_general_dilated(
                f, w.astype(f.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) \
                + b.astype(f.dtype)
            n_cls = pc['bias'].shape[0]
            cls_scores.append(out[..., :n_cls])
            bbox_preds.append(out[..., n_cls:])
        return tuple(cls_scores), tuple(bbox_preds)

    cm_finals = True

    def final_params(self, params, lvl):
        return params['cls_convs'][str(lvl)], params['reg_convs'][str(lvl)]

    def _flatten_level(self, cls_score, bbox_pred):
        b = cls_score.shape[0]
        return (cls_score.reshape(b, -1, self.cls_out_channels),
                bbox_pred.reshape(b, -1, 4))

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key):
        """(ref: ssd_head.py loss/loss_single with neg_pos_ratio mining)."""
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
            return self._targets_single(k, anchors, flags, gb, gv, gl,
                                        shape)

        labels, label_weights, bbox_targets, bbox_weights, npos, nneg, _ = \
            jax.vmap(tgt)(keys, gt_bboxes, gt_valid, gt_labels, img_shapes)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)

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
        return dict(loss_cls=lc.mean(), loss_bbox=lb.mean())

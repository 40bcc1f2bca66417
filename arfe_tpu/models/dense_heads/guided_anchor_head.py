"""Guided Anchoring heads: GuidedAnchorHead, GARPNHead
(ref: mmdet/models/dense_heads/guided_anchor_head.py:14-865, ga_rpn_head.py).

Three box families: *approxs* (the dense octave used only for shape-target
assignment), *squares* (one per location, the base the shape branch refines)
and *guided anchors* (squares + predicted dw/dh deltas). A location branch
predicts objectness used to filter anchors at inference.

TPU-native departures:
- the reference's MaskedConv2d inference trick (compute cls/reg only at
  loc-positive pixels) is intentionally dense here: XLA/TPU prefers dense
  convs, and the loc filter is applied by zeroing scores instead, which is
  detection-equivalent for any score_thr > 0.
- ga_loc_targets' sequential region painting is mask-based: weight = 1 on
  any center region, else 0 on any (same-level or adjacent-level) ignore
  region, else 0.1. (Where one gt's center overlaps another's ignore ring
  the reference's result depends on gt order; this version always keeps the
  center positive.)
- the reference feeds center=1 labels to a 0-positive focal kernel (labels
  0..C-1 are foreground in v2.0), inverting the loc loss; here the loc loss
  uses explicit one-hot targets with center=positive, matching the paper
  and the inference-time filter.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.post.bbox_nms import multiclass_nms
from ...ops.nms import batched_nms
from ...registry import (ANCHOR_GENERATORS, BBOX_ASSIGNERS, BBOX_CODERS,
                         HEADS, LOSSES, build_from_cfg)
from ..layers import Conv2d, Module, take_rows
from .anchor_head import AnchorHead, anchor_inside_flags


class FeatureAdaption(Module):
    """DCN whose offsets come from the shape prediction
    (ref: guided_anchor_head.py:14-52)."""

    def __init__(self, in_channels, out_channels, kernel_size=3,
                 deform_groups=4):
        self.kernel_size = kernel_size
        self.deform_groups = deform_groups
        offset_ch = kernel_size * kernel_size * 2
        self.conv_offset = Conv2d(2, deform_groups * offset_ch, 1,
                                  bias=False, weight_init='normal',
                                  init_std=0.1)
        self.conv_adaption = Conv2d(
            in_channels, out_channels, kernel_size,
            padding=(kernel_size - 1) // 2, bias=False,
            weight_init='normal', init_std=0.01)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'conv_offset': self.conv_offset.init(k1),
                'conv_adaption': self.conv_adaption.init(k2)}

    def __call__(self, params, x, shape):
        from ...ops.deform_conv import deform_conv2d
        offset = self.conv_offset(params['conv_offset'],
                                  jax.lax.stop_gradient(shape))
        return jax.nn.relu(deform_conv2d(
            x, offset, params['conv_adaption']['weight'].astype(x.dtype),
            padding=(self.kernel_size - 1) // 2,
            deform_groups=self.deform_groups))


@HEADS.register_module()
class GuidedAnchorHead(AnchorHead):
    def __init__(self, num_classes, in_channels, feat_channels=256,
                 approx_anchor_generator=None, square_anchor_generator=None,
                 anchor_coder=None, bbox_coder=None, reg_decoded_bbox=False,
                 deformable_groups=4, loc_filter_thr=0.01,
                 background_label=None, train_cfg=None, test_cfg=None,
                 loss_loc=None, loss_shape=None, loss_cls=None,
                 loss_bbox=None):
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.feat_channels = feat_channels
        self.deformable_groups = deformable_groups
        self.loc_filter_thr = loc_filter_thr
        approx_anchor_generator = approx_anchor_generator or dict(
            type='AnchorGenerator', octave_base_scale=8, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64])
        square_anchor_generator = square_anchor_generator or dict(
            type='AnchorGenerator', ratios=[1.0], scales=[8],
            strides=[4, 8, 16, 32, 64])
        assert (approx_anchor_generator['octave_base_scale'] ==
                square_anchor_generator['scales'][0])
        assert (approx_anchor_generator['strides'] ==
                square_anchor_generator['strides'])
        self.approx_anchor_generator = build_from_cfg(
            approx_anchor_generator, ANCHOR_GENERATORS)
        self.square_anchor_generator = build_from_cfg(
            square_anchor_generator, ANCHOR_GENERATORS)
        self.approxs_per_octave = \
            self.approx_anchor_generator.num_base_anchors[0]
        self.reg_decoded_bbox = reg_decoded_bbox
        self.background_label = (num_classes if background_label is None
                                 else background_label)
        self.num_anchors = 1
        loss_cls = loss_cls or dict(type='CrossEntropyLoss',
                                    use_sigmoid=True, loss_weight=1.0)
        loss_loc = loss_loc or dict(type='FocalLoss', use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0)
        loss_shape = loss_shape or dict(type='BoundedIoULoss', beta=0.2,
                                        loss_weight=1.0)
        loss_bbox = loss_bbox or dict(type='SmoothL1Loss', beta=1.0,
                                      loss_weight=1.0)
        self.use_sigmoid_cls = loss_cls.get('use_sigmoid', False)
        self.sampling = loss_cls['type'] not in ['FocalLoss']
        self.ga_sampling = (train_cfg is not None
                            and 'ga_sampler' in train_cfg)
        self.cls_out_channels = (num_classes if self.use_sigmoid_cls
                                 else num_classes + 1)
        self.anchor_coder = build_from_cfg(
            anchor_coder or dict(type='DeltaXYWHBBoxCoder'), BBOX_CODERS)
        self.bbox_coder = build_from_cfg(
            bbox_coder or dict(type='DeltaXYWHBBoxCoder'), BBOX_CODERS)
        self.loss_loc = build_from_cfg(loss_loc, LOSSES)
        self.loss_shape = build_from_cfg(loss_shape, LOSSES)
        self.loss_cls = build_from_cfg(loss_cls, LOSSES)
        self.loss_bbox = build_from_cfg(loss_bbox, LOSSES)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        if train_cfg is not None:
            from ...registry import BBOX_SAMPLERS
            self.assigner = build_from_cfg(train_cfg['assigner'],
                                           BBOX_ASSIGNERS)
            if self.sampling and 'sampler' in train_cfg:
                self.sampler = build_from_cfg(train_cfg['sampler'],
                                              BBOX_SAMPLERS)
            else:
                self.sampler = build_from_cfg(dict(type='PseudoSampler'),
                                              BBOX_SAMPLERS)
            self.ga_assigner = build_from_cfg(train_cfg['ga_assigner'],
                                              BBOX_ASSIGNERS)
            if self.ga_sampling:
                self.ga_sampler = build_from_cfg(train_cfg['ga_sampler'],
                                                 BBOX_SAMPLERS)
        self._init_layers()

    def _init_layers(self):
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.conv_loc = Conv2d(self.in_channels, 1, 1,
                               weight_init='normal', init_std=0.01,
                               bias_value=bias_cls)
        self.conv_shape = Conv2d(self.in_channels, self.num_anchors * 2, 1,
                                 weight_init='normal', init_std=0.01)
        self.feature_adaption = FeatureAdaption(
            self.in_channels, self.feat_channels, kernel_size=3,
            deform_groups=self.deformable_groups)
        self.conv_cls = Conv2d(self.feat_channels,
                               self.num_anchors * self.cls_out_channels, 1,
                               weight_init='normal', init_std=0.01)
        self.conv_reg = Conv2d(self.feat_channels, self.num_anchors * 4, 1,
                               weight_init='normal', init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 5)
        return {'conv_loc': self.conv_loc.init(keys[0]),
                'conv_shape': self.conv_shape.init(keys[1]),
                'feature_adaption': self.feature_adaption.init(keys[2]),
                'conv_cls': self.conv_cls.init(keys[3]),
                'conv_reg': self.conv_reg.init(keys[4])}

    def forward_single(self, params, x):
        # loc + shape 1x1 convs read the same input -> one stacked conv
        pl_, ps_ = params['conv_loc'], params['conv_shape']
        w = jnp.concatenate([pl_['weight'], ps_['weight']], axis=-1)
        b = jnp.concatenate([pl_['bias'], ps_['bias']])
        ls = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b.astype(x.dtype)
        n_loc = pl_['bias'].shape[0]
        loc_pred = ls[..., :n_loc]
        shape_pred = ls[..., n_loc:]
        x = self.feature_adaption(params['feature_adaption'], x, shape_pred)
        cls_score = self.conv_cls(params['conv_cls'], x)
        bbox_pred = self.conv_reg(params['conv_reg'], x)
        return cls_score, bbox_pred, shape_pred, loc_pred

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f) for f in feats]
        return tuple(tuple(o[i] for o in outs) for i in range(4))

    # ------------------------------------------------------------------
    # anchors
    # ------------------------------------------------------------------

    def _squares(self, featmap_sizes):
        return [jnp.asarray(a) for a in
                self.square_anchor_generator.grid_anchors(featmap_sizes)]

    def _guided_anchors(self, squares, shape_pred):
        """squares (P, 4) + shape deltas (B, H, W, 2) -> (B, P, 4)
        (ref: _get_guided_anchors_single, guided_anchor_head.py:347-379)."""
        b = shape_pred.shape[0]
        deltas2 = jax.lax.stop_gradient(
            shape_pred.astype(jnp.float32)).reshape(b, -1, 2)
        deltas = jnp.concatenate(
            [jnp.zeros_like(deltas2), deltas2], axis=-1)
        return jax.vmap(lambda d: self.anchor_coder.decode(
            squares, d, wh_ratio_clip=1e-6))(deltas)

    # ------------------------------------------------------------------
    # training targets
    # ------------------------------------------------------------------

    def ga_loc_targets(self, gt_bboxes, gt_valid, featmap_sizes):
        """Static center/ignore/negative region painting
        (ref: guided_anchor_head.py:381-481).

        Returns per-level (B, H*W) targets/weights + loc_avg_factor.
        """
        anchor_scale = self.approx_anchor_generator.octave_base_scale
        strides = [s[0] for s in self.approx_anchor_generator.strides]
        cfg = self.train_cfg
        r1 = (1 - cfg['center_ratio']) / 2
        r2 = (1 - cfg['ignore_ratio']) / 2
        num_lvls = len(featmap_sizes)
        b = gt_bboxes.shape[0]

        scale = jnp.sqrt(jnp.clip(
            (gt_bboxes[..., 2] - gt_bboxes[..., 0]) *
            (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6, None))
        min_size = float(anchor_scale * strides[0])
        target_lvls = jnp.floor(
            jnp.log2(scale) - math.log2(min_size) + 0.5)
        target_lvls = jnp.clip(target_lvls, 0, num_lvls - 1).astype(
            jnp.int32)                                        # (B, G)

        def region_mask(gtb, ratio, stride, h, w):
            """(B, G, 4) -> in-region mask (B, G, P) for a level grid."""
            g = gtb / stride
            x1 = jnp.clip(jnp.round((1 - ratio) * g[..., 0]
                                    + ratio * g[..., 2]), 0, w - 1)
            y1 = jnp.clip(jnp.round((1 - ratio) * g[..., 1]
                                    + ratio * g[..., 3]), 0, h - 1)
            x2 = jnp.clip(jnp.round(ratio * g[..., 0]
                                    + (1 - ratio) * g[..., 2]), 0, w - 1)
            y2 = jnp.clip(jnp.round(ratio * g[..., 1]
                                    + (1 - ratio) * g[..., 3]), 0, h - 1)
            xi = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
            yi = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
            return ((xi >= x1[..., None]) & (xi <= x2[..., None])
                    & (yi >= y1[..., None]) & (yi <= y2[..., None]))

        loc_targets, loc_weights = [], []
        total = 0
        for lvl in range(num_lvls):
            h, w = featmap_sizes[lvl]
            stride = strides[lvl]
            on_lvl = (target_lvls == lvl) & gt_valid          # (B, G)
            adj = gt_valid & ((target_lvls == lvl - 1)
                              | (target_lvls == lvl + 1))
            ctr = region_mask(gt_bboxes, r1, stride, h, w)
            ign = region_mask(gt_bboxes, r2, stride, h, w)
            in_ctr = (ctr & on_lvl[..., None]).any(axis=1)    # (B, P)
            in_ign = (ign & on_lvl[..., None]).any(axis=1)
            in_adj = (ign & adj[..., None]).any(axis=1)
            tgt = in_ctr.astype(jnp.float32)
            wgt = jnp.where(in_ctr, 1.0,
                            jnp.where(in_ign | in_adj, 0.0, 0.1))
            loc_targets.append(tgt)
            loc_weights.append(wgt)
            total += b * h * w
        return loc_targets, loc_weights, total / 200.0

    def _ga_shape_targets_single(self, approxs, squares, inside, gtb, gv):
        """(ref: _ga_shape_target_single, guided_anchor_head.py:483-544)."""
        res = self.ga_assigner.assign(approxs, squares,
                                      self.approxs_per_octave, gtb, gv,
                                      box_valid=inside)
        assigned = res['assigned_gt_inds']
        pos = assigned > 0
        safe = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        bbox_gts = jnp.where(pos[:, None], take_rows(gtb, safe), 0.0)
        bbox_weights = jnp.where(
            pos[:, None], 1.0,
            jnp.zeros((squares.shape[0], 4), jnp.float32))
        return bbox_gts, bbox_weights, pos.sum(), (assigned == 0).sum()

    def _inside_flags(self, featmap_sizes, img_shapes, pad_shape):
        """Collapsed any-approx-inside flags per location
        (ref: get_sampled_approxs, guided_anchor_head.py:245-293).
        Returns (B, P) bool."""
        approx_flags = np.concatenate(
            self.approx_anchor_generator.valid_flags(featmap_sizes,
                                                     pad_shape))
        approxs = np.concatenate(
            self.approx_anchor_generator.grid_anchors(featmap_sizes))
        k = self.approxs_per_octave
        approxs_j = jnp.asarray(approxs)
        flags_j = jnp.asarray(approx_flags)
        border = self.train_cfg.get('allowed_border', 0) \
            if self.train_cfg else 0

        def per_img(shape):
            inside = anchor_inside_flags(approxs_j, flags_j, shape, border)
            return inside.reshape(-1, k).any(axis=1)

        return jax.vmap(per_img)(img_shapes)

    # ------------------------------------------------------------------

    def loss(self, cls_scores, bbox_preds, shape_preds, loc_preds,
             gt_bboxes, gt_valid, gt_labels, img_shapes, key):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        shape_preds = [p.astype(jnp.float32) for p in shape_preds]
        loc_preds = [p.astype(jnp.float32) for p in loc_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        b = cls_scores[0].shape[0]

        # ---- loc branch ----
        loc_t, loc_w, loc_avg = self.ga_loc_targets(gt_bboxes, gt_valid,
                                                    featmap_sizes)
        loc_flat = jnp.concatenate(
            [p.reshape(b, -1) for p in loc_preds], 1).reshape(-1, 1)
        loc_tgt = jnp.concatenate(loc_t, 1).reshape(-1, 1)
        loc_wgt = jnp.concatenate(loc_w, 1).reshape(-1)
        # one-hot float target: center = positive (see module docstring)
        loss_loc = self.loss_loc(loc_flat, loc_tgt, loc_wgt,
                                 avg_factor=loc_avg)

        # ---- shape branch ----
        squares_l = self._squares(featmap_sizes)
        squares = jnp.concatenate(squares_l, 0)                # (P, 4)
        approxs = jnp.asarray(np.concatenate(
            self.approx_anchor_generator.grid_anchors(featmap_sizes)))
        pad_shape = (
            featmap_sizes[0][0] * self.approx_anchor_generator.strides[0][0],
            featmap_sizes[0][1] * self.approx_anchor_generator.strides[0][1])
        inside = self._inside_flags(featmap_sizes, img_shapes, pad_shape)

        def shape_tgt(ins, gtb, gv):
            return self._ga_shape_targets_single(approxs, squares, ins,
                                                 gtb, gv)
        bbox_gts, sh_weights, npos_ga, nneg_ga = jax.vmap(shape_tgt)(
            inside, gt_bboxes, gt_valid)
        anchor_fg = jnp.maximum(npos_ga, 1).sum()
        anchor_total = (anchor_fg if not self.ga_sampling
                        else anchor_fg + jnp.maximum(nneg_ga, 1).sum())

        shape_flat = jnp.concatenate(
            [p.reshape(b, -1, 2) for p in shape_preds], 1)     # (B, P, 2)
        deltas = jnp.concatenate(
            [jnp.zeros_like(shape_flat), shape_flat], -1).reshape(-1, 4)
        sq_rep = jnp.tile(squares, (b, 1))
        pred_anchors = self.anchor_coder.decode(sq_rep, deltas,
                                                wh_ratio_clip=1e-6)
        loss_shape = self.loss_shape(pred_anchors,
                                     bbox_gts.reshape(-1, 4),
                                     sh_weights.reshape(-1, 4),
                                     avg_factor=anchor_total.astype(
                                         jnp.float32))

        # ---- cls/reg on guided anchors ----
        ga_l = [self._guided_anchors(sq, sp)
                for sq, sp in zip(squares_l, shape_preds)]
        guided = jnp.concatenate(ga_l, 1)                      # (B, P, 4)
        keys = jax.random.split(key, b)
        if gt_labels is not None:
            out = jax.vmap(self._targets_single)(
                keys, guided, inside, gt_bboxes, gt_valid, gt_labels,
                img_shapes)
        else:
            out = jax.vmap(
                lambda k, anc, ins, gb, gv, shape: self._targets_single(
                    k, anc, ins, gb, gv, None, shape))(
                keys, guided, inside, gt_bboxes, gt_valid, img_shapes)
        labels, label_weights, bbox_targets, bbox_weights, npos, nneg = out
        num_pos = jnp.maximum(npos, 1).sum()
        num_neg = jnp.maximum(nneg, 1).sum()
        num_total = (num_pos + num_neg if self.sampling
                     else num_pos).astype(jnp.float32)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1).reshape(-1, self.cls_out_channels)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1).reshape(-1, 4)
        if self.use_sigmoid_cls and self.cls_out_channels == 1:
            loss_cls = self.loss_cls(
                cls_flat[:, 0], labels.reshape(-1).astype(jnp.float32),
                label_weights.reshape(-1), avg_factor=num_total)
        else:
            loss_cls = self.loss_cls(cls_flat, labels.reshape(-1),
                                     label_weights.reshape(-1),
                                     avg_factor=num_total)
        loss_bbox = self.loss_bbox(box_flat, bbox_targets.reshape(-1, 4),
                                   bbox_weights.reshape(-1, 4),
                                   avg_factor=num_total)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_shape=loss_shape, loss_loc=loss_loc)

    def _targets_single(self, key, anchors, valid_flags, gt_bboxes, gt_valid,
                        gt_labels, img_shape):
        """AnchorHead targets but with per-image (guided) anchors; the
        inside test was already done on approxs."""
        assign = self.assigner.assign(
            anchors, gt_bboxes, gt_valid,
            None if self.sampling else gt_labels, box_valid=valid_flags)
        assigned = assign['assigned_gt_inds']
        sample = self.sampler.sample(key, assigned)
        n = anchors.shape[0]
        labels = jnp.full((n,), self.background_label, jnp.int32)
        label_weights = jnp.zeros((n,), jnp.float32)
        safe_gt = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        matched_gt = take_rows(gt_bboxes, safe_gt)
        if not self.reg_decoded_bbox:
            all_targets = self.bbox_coder.encode(anchors, matched_gt)
        else:
            all_targets = matched_gt
        if gt_labels is None:
            all_labels = jnp.ones((n,), jnp.int32)
        else:
            all_labels = take_rows(gt_labels.astype(jnp.int32), safe_gt)
        if self.sampling:
            inds, is_pos, svalid = (sample['inds'], sample['is_pos'],
                                    sample['valid'])
            pos_sel = jnp.zeros((n,), bool).at[inds].max(is_pos & svalid)
            neg_sel = jnp.zeros((n,), bool).at[inds].max((~is_pos) & svalid)
        else:
            pos_sel = assigned > 0
            neg_sel = assigned == 0
        pos_w = self.train_cfg.get('pos_weight', -1)
        pos_w = 1.0 if pos_w <= 0 else pos_w
        labels = jnp.where(pos_sel, all_labels, labels)
        label_weights = jnp.where(pos_sel, pos_w, label_weights)
        label_weights = jnp.where(neg_sel, 1.0, label_weights)
        bbox_targets = jnp.where(pos_sel[:, None], all_targets, 0.0)
        bbox_weights = jnp.where(pos_sel[:, None], 1.0,
                                 jnp.zeros((n, 4), jnp.float32))
        return (labels, label_weights, bbox_targets, bbox_weights,
                pos_sel.sum(), neg_sel.sum())

    # ------------------------------------------------------------------

    def get_bboxes(self, cls_scores, bbox_preds, shape_preds, loc_preds,
                   img_shapes, scale_factors, cfg=None, rescale=False):
        cfg = self.test_cfg if cfg is None else cfg
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        squares_l = self._squares(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]
        probs_l, preds_l, anchors_l = [], [], []
        for cls_score, bbox_pred, shape_pred, loc_pred, squares in zip(
                cls_scores, bbox_preds, shape_preds, loc_preds, squares_l):
            scores = cls_score.reshape(b, -1, self.cls_out_channels)
            if self.use_sigmoid_cls:
                probs = jax.nn.sigmoid(scores)
            else:
                probs = jax.nn.softmax(scores, -1)
            # loc filter: zero out scores below threshold instead of
            # dropping positions (static shapes)
            loc = jax.nn.sigmoid(
                loc_pred.astype(jnp.float32)).reshape(b, -1)
            mask = (loc >= self.loc_filter_thr).astype(probs.dtype)
            probs = probs * mask[..., None]
            anchors = self._guided_anchors(squares, shape_pred)  # (B, P, 4)
            preds = bbox_pred.reshape(b, -1, 4)
            hwa = probs.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                max_scores = (probs.max(-1) if self.use_sigmoid_cls
                              else probs[..., :-1].max(-1))
                _, idx = jax.lax.top_k(max_scores, nms_pre)
                probs = jnp.take_along_axis(probs, idx[..., None], 1)
                preds = jnp.take_along_axis(preds, idx[..., None], 1)
                anchors = jnp.take_along_axis(anchors, idx[..., None], 1)
            probs_l.append(probs)
            preds_l.append(preds)
            anchors_l.append(anchors)
        probs = jnp.concatenate(probs_l, 1)
        preds = jnp.concatenate(preds_l, 1)
        anchors = jnp.concatenate(anchors_l, 1)

        bboxes = jax.vmap(lambda a, p, s: self.bbox_coder.decode(
            a, p, max_shape=s))(anchors, preds, img_shapes)
        if rescale:
            bboxes = bboxes / scale_factors[:, None, :4]
        if self.use_sigmoid_cls:
            padding = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)
            probs = jnp.concatenate([probs, padding], -1)

        def _one(bb, ss):
            return multiclass_nms(bb, ss, cfg['score_thr'], cfg['nms'],
                                  cfg['max_per_img'],
                                  pre_nms_cap=cfg.get('nms_cap', 2000))

        return jax.vmap(_one)(bboxes, probs)


@HEADS.register_module()
class GARPNHead(GuidedAnchorHead):
    """Guided-anchor RPN (ref: mmdet/models/dense_heads/ga_rpn_head.py)."""

    def __init__(self, in_channels, **kwargs):
        super().__init__(1, in_channels, background_label=0, **kwargs)

    def _init_layers(self):
        self.rpn_conv = Conv2d(self.in_channels, self.feat_channels, 3,
                               padding=1, weight_init='normal',
                               init_std=0.01)
        save_in = self.in_channels
        self.in_channels = self.feat_channels
        super()._init_layers()
        self.in_channels = save_in

    def init(self, key):
        k0, krest = jax.random.split(key)
        p = super().init(krest)
        p['rpn_conv'] = self.rpn_conv.init(k0)
        return p

    def forward_single(self, params, x):
        x = jax.nn.relu(self.rpn_conv(params['rpn_conv'], x))
        return super().forward_single(params, x)

    def loss(self, cls_scores, bbox_preds, shape_preds, loc_preds,
             gt_bboxes, gt_valid, img_shapes, key):
        losses = super().loss(cls_scores, bbox_preds, shape_preds,
                              loc_preds, gt_bboxes, gt_valid, None,
                              img_shapes, key)
        return dict(loss_rpn_cls=losses['loss_cls'],
                    loss_rpn_bbox=losses['loss_bbox'],
                    loss_anchor_shape=losses['loss_shape'],
                    loss_anchor_loc=losses['loss_loc'])

    def get_bboxes(self, cls_scores, bbox_preds, shape_preds, loc_preds,
                   img_shapes, scale_factors=None, cfg=None, rescale=False):
        """RPN-style proposals: level-keyed NMS at fixed capacity
        (ref: ga_rpn_head.py:58-120)."""
        cfg = self.test_cfg if cfg is None else cfg
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        squares_l = self._squares(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        nms_post = cfg.get('nms_post', cfg.get('max_num', 1000))
        b = cls_scores[0].shape[0]
        scores_l, preds_l, anchors_l, ids_l = [], [], [], []
        for lvl, (cls_score, bbox_pred, shape_pred, loc_pred, squares) in \
                enumerate(zip(cls_scores, bbox_preds, shape_preds,
                              loc_preds, squares_l)):
            if self.use_sigmoid_cls:
                scores = jax.nn.sigmoid(cls_score.reshape(b, -1))
            else:
                scores = jax.nn.softmax(
                    cls_score.reshape(b, -1, 2), -1)[..., 0]
            loc = jax.nn.sigmoid(
                loc_pred.astype(jnp.float32)).reshape(b, -1)
            scores = scores * (loc >= self.loc_filter_thr)
            anchors = self._guided_anchors(squares, shape_pred)
            preds = bbox_pred.reshape(b, -1, 4)
            hwa = scores.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                scores, idx = jax.lax.top_k(scores, nms_pre)
                preds = jnp.take_along_axis(preds, idx[..., None], 1)
                anchors = jnp.take_along_axis(anchors, idx[..., None], 1)
            scores_l.append(scores)
            preds_l.append(preds)
            anchors_l.append(anchors)
            ids_l.append(jnp.full(scores.shape, lvl, jnp.int32))
        scores = jnp.concatenate(scores_l, 1)
        preds = jnp.concatenate(preds_l, 1)
        anchors = jnp.concatenate(anchors_l, 1)
        ids = jnp.concatenate(ids_l, 1)

        proposals = jax.vmap(lambda a, p, s: self.bbox_coder.decode(
            a, p, max_shape=s))(anchors, preds, img_shapes)
        min_size = cfg.get('min_bbox_size', 0)
        w = proposals[..., 2] - proposals[..., 0]
        h = proposals[..., 3] - proposals[..., 1]
        valid = (w >= min_size) & (h >= min_size) & (scores > 0)

        nms_cfg = dict(type='nms', iou_thr=cfg['nms_thr'])

        def _nms_one(boxes, sc, lvl_ids, vm):
            dets, _, out_valid = batched_nms(boxes, sc, lvl_ids, nms_cfg,
                                             max_out=nms_post,
                                             valid_mask=vm)
            return dets, out_valid

        dets, out_valid = jax.vmap(_nms_one)(proposals, scores, ids, valid)
        return dets, out_valid

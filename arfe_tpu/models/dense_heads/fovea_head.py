"""FoveaBox head (ref: mmdet/models/dense_heads/fovea_head.py:41-409).

Anchor-free: each gt paints a shrunken "fovea" rectangle of positives on
the pyramid level(s) whose scale range contains sqrt(area); regression
targets are log-space normalized distances to the gt edges.

TPU-native departures from the reference:
- target painting (a per-gt python loop of rectangle writes, with
  smaller-area gts painted last so they win overlaps) is replaced by a
  mask-based argmin-over-area per point — identical result, static shape.
- decode + NMS are batched/static as in the other heads here.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.post.bbox_nms import multiclass_nms
from ...registry import HEADS, LOSSES, build_from_cfg
from ..layers import Conv2d, ConvModule, Module, take_rows

INF = 1e8


class FeatureAlign(Module):
    """DCN whose offsets come from the (exp'd) bbox prediction
    (ref: fovea_head.py:12-38)."""

    def __init__(self, in_channels, out_channels, kernel_size=3,
                 deform_groups=4):
        self.kernel_size = kernel_size
        self.deform_groups = deform_groups
        offset_ch = kernel_size * kernel_size * 2
        self.conv_offset = Conv2d(4, deform_groups * offset_ch, 1,
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
        offset = self.conv_offset(params['conv_offset'], shape)
        return jax.nn.relu(deform_conv2d(
            x, offset, params['conv_adaption']['weight'],
            padding=(self.kernel_size - 1) // 2,
            deform_groups=self.deform_groups))


@HEADS.register_module()
class FoveaHead(Module):
    def __init__(self, num_classes, in_channels, feat_channels=256,
                 stacked_convs=4, strides=(4, 8, 16, 32, 64),
                 base_edge_list=(16, 32, 64, 128, 256),
                 scale_ranges=((8, 32), (16, 64), (32, 128), (64, 256),
                               (128, 512)),
                 sigma=0.4, with_deform=False, deformable_groups=4,
                 background_label=None, loss_cls=None, loss_bbox=None,
                 conv_cfg=None, norm_cfg=None, train_cfg=None,
                 test_cfg=None):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        self.use_sigmoid_cls = True
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        self.stacked_convs = stacked_convs
        self.strides = strides
        self.base_edge_list = base_edge_list
        self.scale_ranges = scale_ranges
        self.sigma = sigma
        self.with_deform = with_deform
        self.deformable_groups = deformable_groups
        self.background_label = (num_classes if background_label is None
                                 else background_label)
        self.norm_cfg = norm_cfg
        self.loss_cls = build_from_cfg(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=1.5, alpha=0.4,
            loss_weight=1.0), LOSSES)
        self.loss_bbox = build_from_cfg(loss_bbox or dict(
            type='SmoothL1Loss', beta=0.11, loss_weight=0.75), LOSSES)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        # channel-major inference (see AnchorHead.get_bboxes_feats): the
        # deform cls branch consumes the NHWC bbox_pred, so only the plain
        # head opts in
        self.cm_finals = not with_deform
        self._init_layers()

    def _init_layers(self):
        self.reg_convs = []
        for i in range(self.stacked_convs):
            chn = self.in_channels if i == 0 else self.feat_channels
            self.reg_convs.append(ConvModule(
                chn, self.feat_channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
        self.fovea_reg = Conv2d(self.feat_channels, 4, 3, padding=1,
                                weight_init='normal', init_std=0.01)
        self.cls_convs = []
        if not self.with_deform:
            for i in range(self.stacked_convs):
                chn = self.in_channels if i == 0 else self.feat_channels
                self.cls_convs.append(ConvModule(
                    chn, self.feat_channels, 3, padding=1,
                    norm_cfg=self.norm_cfg, act_cfg='relu',
                    weight_init='normal', init_std=0.01))
            cls_in = self.feat_channels
        else:
            # ref: fovea_head.py:124-151
            self.cls_convs.append(ConvModule(
                self.feat_channels, self.feat_channels * 4, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
            self.cls_convs.append(ConvModule(
                self.feat_channels * 4, self.feat_channels * 4, 1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
            self.feature_adaption = FeatureAlign(
                self.feat_channels, self.feat_channels, kernel_size=3,
                deform_groups=self.deformable_groups)
            cls_in = self.feat_channels * 4
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.fovea_cls = Conv2d(cls_in, self.cls_out_channels, 3, padding=1,
                                weight_init='normal', init_std=0.01,
                                bias_value=bias_cls)

    def init(self, key):
        n = len(self.cls_convs) + len(self.reg_convs) + 3
        keys = jax.random.split(key, n)
        it = iter(keys)
        p = {'reg_convs': {str(i): m.init(next(it))
                           for i, m in enumerate(self.reg_convs)},
             'cls_convs': {str(i): m.init(next(it))
                           for i, m in enumerate(self.cls_convs)},
             'fovea_reg': self.fovea_reg.init(next(it)),
             'fovea_cls': self.fovea_cls.init(next(it))}
        if self.with_deform:
            p['feature_adaption'] = self.feature_adaption.init(next(it))
        return p

    def forward_single(self, params, x):
        reg_feat = x
        for i, m in enumerate(self.reg_convs):
            reg_feat = m(params['reg_convs'][str(i)], reg_feat)
        bbox_pred = self.fovea_reg(params['fovea_reg'], reg_feat)
        cls_feat = x
        if self.with_deform:
            cls_feat = self.feature_adaption(
                params['feature_adaption'], cls_feat, jnp.exp(bbox_pred))
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        cls_score = self.fovea_cls(params['fovea_cls'], cls_feat)
        return cls_score, bbox_pred

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f) for f in feats]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def _level_targets(self, lvl, featmap_size, gt_bboxes, gt_valid,
                       gt_labels):
        """Static mask-based rewrite of the reference's rectangle painting
        (ref: fovea_head.py:267-326): a point takes the min-area gt whose
        shrunken fovea rectangle covers it on this level."""
        h, w = featmap_size
        stride = self.strides[lvl]
        base_len = self.base_edge_list[lvl]
        lo, up = self.scale_ranges[lvl]
        areas = jnp.sqrt(jnp.clip(
            (gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
            (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0, None))
        hit = gt_valid & (areas >= lo) & (areas <= up)

        gtb = gt_bboxes / stride
        half_w = 0.5 * (gtb[:, 2] - gtb[:, 0])
        half_h = 0.5 * (gtb[:, 3] - gtb[:, 1])
        pos_l = jnp.clip(jnp.ceil(
            gtb[:, 0] + (1 - self.sigma) * half_w - 0.5), 0, w - 1)
        pos_r = jnp.clip(jnp.floor(
            gtb[:, 0] + (1 + self.sigma) * half_w - 0.5), 0, w - 1)
        pos_t = jnp.clip(jnp.ceil(
            gtb[:, 1] + (1 - self.sigma) * half_h - 0.5), 0, h - 1)
        pos_d = jnp.clip(jnp.floor(
            gtb[:, 1] + (1 + self.sigma) * half_h - 0.5), 0, h - 1)

        xi = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)       # (P,)
        yi = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
        inside = ((xi[:, None] >= pos_l[None]) &
                  (xi[:, None] <= pos_r[None]) &
                  (yi[:, None] >= pos_t[None]) &
                  (yi[:, None] <= pos_d[None]) & hit[None])      # (P, G)
        cand = jnp.where(inside, areas[None], INF)
        win = cand.argmin(-1)
        pos = cand.min(-1) < INF

        labels = jnp.where(pos, take_rows(gt_labels, win),
                           self.background_label).astype(jnp.int32)
        gx = (xi + 0.5) * stride
        gy = (yi + 0.5) * stride
        wb = take_rows(gt_bboxes, win)                            # (P, 4)
        t = jnp.stack([(gx - wb[:, 0]) / base_len,
                       (gy - wb[:, 1]) / base_len,
                       (wb[:, 2] - gx) / base_len,
                       (wb[:, 3] - gy) / base_len], -1)
        t = jnp.where(pos[:, None], t, 1.0)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        return labels, t, pos

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key=None):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        b = cls_scores[0].shape[0]

        lab_l, tgt_l, pos_l = [], [], []
        for lvl, fs in enumerate(featmap_sizes):
            lab, tgt, pos = jax.vmap(
                lambda gb, gv, gl, lvl=lvl, fs=fs: self._level_targets(
                    lvl, fs, gb, gv, gl))(gt_bboxes, gt_valid, gt_labels)
            lab_l.append(lab)
            tgt_l.append(tgt)
            pos_l.append(pos)
        labels = jnp.concatenate(lab_l, 1).reshape(-1)
        targets = jnp.concatenate(tgt_l, 1).reshape(-1, 4)
        pos = jnp.concatenate(pos_l, 1).reshape(-1)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1).reshape(-1, self.cls_out_channels)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1).reshape(-1, 4)

        num_pos = pos.sum().astype(jnp.float32)
        loss_cls = self.loss_cls(cls_flat, labels, avg_factor=num_pos + b)
        w = pos.astype(jnp.float32)[:, None] * jnp.ones((1, 4), jnp.float32)
        loss_bbox = self.loss_bbox(box_flat, targets, w,
                                   avg_factor=jnp.maximum(num_pos, 1.0))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   cfg=None, rescale=False):
        cfg = self.test_cfg if cfg is None else cfg
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        b = cls_scores[0].shape[0]
        nms_pre = cfg.get('nms_pre', -1)
        probs_l, boxes_l = [], []
        for lvl, (cls_score, bbox_pred) in enumerate(
                zip(cls_scores, bbox_preds)):
            h, w = cls_score.shape[1], cls_score.shape[2]
            stride = self.strides[lvl]
            base_len = self.base_edge_list[lvl]
            scores = jax.nn.sigmoid(
                cls_score.reshape(b, -1, self.cls_out_channels))
            preds = jnp.exp(bbox_pred.reshape(b, -1, 4))
            x = jnp.tile(jnp.arange(w, dtype=jnp.float32) + 0.5, h)
            y = jnp.repeat(jnp.arange(h, dtype=jnp.float32) + 0.5, w)
            pts = jnp.stack([x, y], -1)
            hwa = scores.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                max_scores = scores.max(-1)
                _, idx = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, idx[..., None], 1)
                preds = jnp.take_along_axis(preds, idx[..., None], 1)
                pts_b = pts[idx]
            else:
                pts_b = jnp.broadcast_to(pts[None], (b, hwa, 2))

            def _decode(p_, d_, shape):
                x1 = jnp.clip(stride * p_[:, 0] - base_len * d_[:, 0],
                              0, shape[1] - 1)
                y1 = jnp.clip(stride * p_[:, 1] - base_len * d_[:, 1],
                              0, shape[0] - 1)
                x2 = jnp.clip(stride * p_[:, 0] + base_len * d_[:, 2],
                              0, shape[1] - 1)
                y2 = jnp.clip(stride * p_[:, 1] + base_len * d_[:, 3],
                              0, shape[0] - 1)
                return jnp.stack([x1, y1, x2, y2], -1)

            boxes = jax.vmap(_decode)(pts_b, preds, img_shapes)
            probs_l.append(scores)
            boxes_l.append(boxes)
        return self._bboxes_tail(probs_l, boxes_l, scale_factors, cfg,
                                 rescale)

    def _bboxes_tail(self, probs_l, boxes_l, scale_factors, cfg, rescale):
        """Shared rescale + multiclass-NMS tail."""
        probs = jnp.concatenate(probs_l, 1)
        boxes = jnp.concatenate(boxes_l, 1)
        if rescale:
            boxes = boxes / scale_factors[:, None, :4]
        padding = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)
        probs = jnp.concatenate([probs, padding], -1)

        def _one(bb, ss):
            return multiclass_nms(bb, ss, cfg['score_thr'], cfg['nms'],
                                  cfg['max_per_img'],
                                  pre_nms_cap=cfg.get('nms_cap', 2000))

        return jax.vmap(_one)(boxes, probs)

    def get_bboxes_feats(self, params, feats, img_shapes, scale_factors,
                         cfg=None, rescale=False):
        """Channel-major inference (see AnchorHead.get_bboxes_feats): the
        4-channel reg map lane-pads to 128 in NHWC; the finals here run
        NCHW-out and only top-k candidates are gathered. Anchor-free =>
        candidate order matches get_bboxes exactly."""
        from .anchor_head import AnchorHead
        cfg = self.test_cfg if cfg is None else cfg
        nms_pre = cfg.get('nms_pre', -1)
        probs_l, boxes_l = [], []
        for lvl, xf in enumerate(feats):
            reg_feat = xf
            for i, m in enumerate(self.reg_convs):
                reg_feat = m(params['reg_convs'][str(i)], reg_feat)
            cls_feat = xf
            for i, m in enumerate(self.cls_convs):
                cls_feat = m(params['cls_convs'][str(i)], cls_feat)
            pc, pr = params['fovea_cls'], params['fovea_reg']
            cls_t = AnchorHead._conv_cm(
                cls_feat, pc['weight'], pc['bias']).astype(jnp.float32)
            reg_t = AnchorHead._conv_cm(
                reg_feat, pr['weight'], pr['bias']).astype(jnp.float32)
            scores_t = jax.nn.sigmoid(cls_t)                # (B, C, HW)
            dists_t = jnp.exp(reg_t)                        # (B, 4, HW)
            b, hw = scores_t.shape[0], scores_t.shape[-1]
            h, w = xf.shape[1], xf.shape[2]
            stride = self.strides[lvl]
            base_len = self.base_edge_list[lvl]
            x = jnp.tile(jnp.arange(w, dtype=jnp.float32) + 0.5, h)
            y = jnp.repeat(jnp.arange(h, dtype=jnp.float32) + 0.5, w)
            pts = jnp.stack([x, y], -1)
            if nms_pre > 0 and hw > nms_pre:
                _, idx = jax.lax.top_k(scores_t.max(axis=1), nms_pre)

                def _gather(t, xi):                         # (C,HW) -> (P,C)
                    return t[:, xi].T

                scores = jax.vmap(_gather)(scores_t, idx)
                preds = jax.vmap(_gather)(dists_t, idx)
                pts_b = pts[idx]
            else:
                scores = scores_t.transpose(0, 2, 1)
                preds = dists_t.transpose(0, 2, 1)
                pts_b = jnp.broadcast_to(pts[None], (b, hw, 2))

            def _decode(p_, d_, shape):
                x1 = jnp.clip(stride * p_[:, 0] - base_len * d_[:, 0],
                              0, shape[1] - 1)
                y1 = jnp.clip(stride * p_[:, 1] - base_len * d_[:, 1],
                              0, shape[0] - 1)
                x2 = jnp.clip(stride * p_[:, 0] + base_len * d_[:, 2],
                              0, shape[1] - 1)
                y2 = jnp.clip(stride * p_[:, 1] + base_len * d_[:, 3],
                              0, shape[0] - 1)
                return jnp.stack([x1, y1, x2, y2], -1)

            boxes = jax.vmap(_decode)(pts_b, preds, img_shapes)
            probs_l.append(scores)
            boxes_l.append(boxes)
        return self._bboxes_tail(probs_l, boxes_l, scale_factors, cfg,
                                 rescale)

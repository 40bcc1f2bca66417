"""FCOS head (ref: mmdet/models/dense_heads/fcos_head.py).

Anchor-free: per-point class scores, (l, t, r, b) distances scaled by a
per-level learnable scale, and centerness. Targets are mask-based and
static: every point is matched against all padded gts; the min-area gt
inside the point's regress range wins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox.transforms import distance2bbox
from ...core.post.bbox_nms import multiclass_nms
from ...registry import HEADS, LOSSES, build_from_cfg
from ..layers import Conv2d, ConvModule, Module, take_rows

INF = 1e8


@HEADS.register_module()
class FCOSHead(Module):
    def __init__(self, num_classes, in_channels, feat_channels=256,
                 stacked_convs=4, strides=(4, 8, 16, 32, 64),
                 regress_ranges=((-1, 64), (64, 128), (128, 256),
                                 (256, 512), (512, INF)),
                 loss_cls=None, loss_bbox=None, loss_centerness=None,
                 norm_cfg=None, background_label=None, train_cfg=None,
                 test_cfg=None, center_sampling=False, center_sample_radius=1.5,
                 conv_cfg=None):
        self.num_classes = num_classes
        self.cls_out_channels = num_classes
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        self.stacked_convs = stacked_convs
        self.strides = strides
        self.regress_ranges = regress_ranges
        self.norm_cfg = norm_cfg if norm_cfg is not None else \
            dict(type='GN', num_groups=32, requires_grad=True)
        self.use_sigmoid_cls = True
        self.background_label = num_classes
        self.loss_cls = build_from_cfg(loss_cls or dict(
            type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=1.0), LOSSES)
        self.loss_bbox = build_from_cfg(loss_bbox or dict(
            type='IoULoss', loss_weight=1.0), LOSSES)
        self.loss_centerness = build_from_cfg(loss_centerness or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
            LOSSES)
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        self._init_layers()

    def _init_layers(self):
        self.cls_convs = []
        self.reg_convs = []
        for i in range(self.stacked_convs):
            chn = self.in_channels if i == 0 else self.feat_channels
            self.cls_convs.append(ConvModule(
                chn, self.feat_channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
            self.reg_convs.append(ConvModule(
                chn, self.feat_channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
        import math
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.conv_cls = Conv2d(self.feat_channels, self.num_classes, 3,
                               padding=1, weight_init='normal',
                               init_std=0.01, bias_value=bias_cls)
        self.conv_reg = Conv2d(self.feat_channels, 4, 3, padding=1,
                               weight_init='normal', init_std=0.01)
        self.conv_centerness = Conv2d(self.feat_channels, 1, 3, padding=1,
                                      weight_init='normal', init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs + 3)
        p = {'cls_convs': {str(i): m.init(keys[i])
                           for i, m in enumerate(self.cls_convs)},
             'reg_convs': {str(i): m.init(keys[self.stacked_convs + i])
                           for i, m in enumerate(self.reg_convs)},
             'conv_cls': self.conv_cls.init(keys[-3]),
             'conv_reg': self.conv_reg.init(keys[-2]),
             'conv_centerness': self.conv_centerness.init(keys[-1]),
             'scales': jnp.ones((len(self.strides),), jnp.float32)}
        return p

    def forward_single(self, params, x, lvl):
        cls_feat = x
        reg_feat = x
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        for i, m in enumerate(self.reg_convs):
            reg_feat = m(params['reg_convs'][str(i)], reg_feat)
        # cls + centerness convs read the same cls tower -> one stacked
        # conv (bit-exact; stored params stay separate)
        pc = params['conv_cls']
        pn = params['conv_centerness']
        w = jnp.concatenate([pc['weight'], pn['weight']], axis=-1)
        b = jnp.concatenate([pc['bias'], pn['bias']])
        out = jax.lax.conv_general_dilated(
            cls_feat, w.astype(cls_feat.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) \
            + b.astype(cls_feat.dtype)
        n_cls = pc['bias'].shape[0]
        cls_score = out[..., :n_cls]
        centerness = out[..., n_cls:]
        bbox_pred = self.conv_reg(params['conv_reg'], reg_feat)
        bbox_pred = jnp.exp(params['scales'][lvl] * bbox_pred)
        return cls_score, bbox_pred, centerness

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f, i)
                for i, f in enumerate(feats)]
        return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                tuple(o[2] for o in outs))

    def _points(self, featmap_sizes):
        points = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            xs = (np.arange(w) + 0.5) * s
            ys = (np.arange(h) + 0.5) * s
            px = np.tile(xs, h)
            py = np.repeat(ys, w)
            points.append(np.stack([px, py], -1).astype(np.float32))
        return points

    # ------------------------------------------------------------------
    def get_bboxes(self, cls_scores, bbox_preds, centernesses, img_shapes,
                   scale_factors, cfg=None, rescale=False):
        cfg = self.test_cfg if cfg is None else cfg
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        points = self._points(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        b = cls_scores[0].shape[0]
        probs_l, boxes_l, cent_l = [], [], []
        for cls_score, bbox_pred, cent, pts in zip(
                cls_scores, bbox_preds, centernesses, points):
            scores = jax.nn.sigmoid(cls_score.reshape(b, -1,
                                                      self.num_classes))
            cent_s = jax.nn.sigmoid(cent.reshape(b, -1))
            dists = bbox_pred.reshape(b, -1, 4)
            pts_j = jnp.asarray(pts)
            hwa = scores.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                max_scores = (scores * cent_s[..., None]).max(-1)
                _, idx = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, idx[..., None], 1)
                cent_s = jnp.take_along_axis(cent_s, idx, 1)
                dists = jnp.take_along_axis(dists, idx[..., None], 1)
                pts_b = pts_j[idx]
            else:
                pts_b = jnp.broadcast_to(pts_j[None], (b, hwa, 2))
            boxes = jax.vmap(
                lambda p_, d_, sh: distance2bbox(p_, d_, max_shape=sh))(
                    pts_b, dists, img_shapes)
            probs_l.append(scores)
            boxes_l.append(boxes)
            cent_l.append(cent_s)
        return self._bboxes_tail(probs_l, boxes_l, cent_l, scale_factors,
                                 cfg, rescale)

    def _bboxes_tail(self, probs_l, boxes_l, cent_l, scale_factors, cfg,
                     rescale):
        """Shared rescale + centerness-weighted multiclass-NMS tail."""
        probs = jnp.concatenate(probs_l, 1)
        boxes = jnp.concatenate(boxes_l, 1)
        cents = jnp.concatenate(cent_l, 1)
        if rescale:
            boxes = boxes / scale_factors[:, None, :4]
        padding = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)
        probs = jnp.concatenate([probs, padding], -1)

        def _one(bb, ss, cc):
            return multiclass_nms(bb, ss, cfg['score_thr'], cfg['nms'],
                                  cfg['max_per_img'], score_factors=cc,
                                  pre_nms_cap=cfg.get('nms_cap', 2000))

        return jax.vmap(_one)(boxes, probs, cents)

    # ------------------------------------------------------------------
    # channel-major inference (see AnchorHead.get_bboxes_feats: few-channel
    # NHWC head outputs lane-pad to 128; the 1-channel centerness and
    # 4-channel reg maps are the worst offenders). Anchor-free => A=1, so
    # the candidate order matches get_bboxes exactly.
    # ------------------------------------------------------------------

    cm_finals = True

    def get_bboxes_feats(self, params, feats, img_shapes, scale_factors,
                         cfg=None, rescale=False):
        from .anchor_head import AnchorHead
        cfg = self.test_cfg if cfg is None else cfg
        featmap_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        points = self._points(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        c = self.num_classes
        probs_l, boxes_l, cent_l = [], [], []
        for lvl, (x, pts) in enumerate(zip(feats, points)):
            cls_feat = x
            reg_feat = x
            for i, m in enumerate(self.cls_convs):
                cls_feat = m(params['cls_convs'][str(i)], cls_feat)
            for i, m in enumerate(self.reg_convs):
                reg_feat = m(params['reg_convs'][str(i)], reg_feat)
            pc = params['conv_cls']
            pn = params['conv_centerness']
            pr = params['conv_reg']
            # cls + centerness share the cls tower -> one stacked conv
            w = jnp.concatenate([pc['weight'], pn['weight']], axis=-1)
            bias = jnp.concatenate([pc['bias'], pn['bias']])
            out = AnchorHead._conv_cm(cls_feat, w, bias).astype(jnp.float32)
            cls_t, cent_t = out[:, :c], out[:, c]       # (B,C,HW), (B,HW)
            reg_t = AnchorHead._conv_cm(
                reg_feat, pr['weight'], pr['bias']).astype(jnp.float32)
            dists_t = jnp.exp(
                params['scales'][lvl].astype(jnp.float32) * reg_t)
            scores_t = jax.nn.sigmoid(cls_t)
            cent_s = jax.nn.sigmoid(cent_t)
            b, hw = cent_s.shape
            pts_j = jnp.asarray(pts)
            if nms_pre > 0 and hw > nms_pre:
                max_sc = scores_t.max(axis=1) * cent_s
                _, idx = jax.lax.top_k(max_sc, nms_pre)

                def _gather(t, xi):                     # (C,HW) -> (P,C)
                    return t[:, xi].T

                scores_g = jax.vmap(_gather)(scores_t, idx)
                dists_g = jax.vmap(_gather)(dists_t, idx)
                cent_g = jnp.take_along_axis(cent_s, idx, 1)
                pts_b = pts_j[idx]
            else:
                scores_g = scores_t.transpose(0, 2, 1)
                dists_g = dists_t.transpose(0, 2, 1)
                cent_g = cent_s
                pts_b = jnp.broadcast_to(pts_j[None], (b, hw, 2))
            boxes = jax.vmap(
                lambda p_, d_, sh: distance2bbox(p_, d_, max_shape=sh))(
                    pts_b, dists_g, img_shapes)
            probs_l.append(scores_g)
            boxes_l.append(boxes)
            cent_l.append(cent_g)
        return self._bboxes_tail(probs_l, boxes_l, cent_l, scale_factors,
                                 cfg, rescale)

    # ------------------------------------------------------------------
    def _targets_single(self, points, regress_ranges, gt_bboxes, gt_valid,
                        gt_labels):
        """Mask-based FCOS target assignment (ref: fcos_head.py
        get_targets/_get_target_single)."""
        num_points = points.shape[0]
        num_gts = gt_bboxes.shape[0]
        areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
            (gt_bboxes[:, 3] - gt_bboxes[:, 1])
        areas = jnp.where(gt_valid, areas, INF)
        xs = points[:, 0][:, None]
        ys = points[:, 1][:, None]
        left = xs - gt_bboxes[None, :, 0]
        right = gt_bboxes[None, :, 2] - xs
        top = ys - gt_bboxes[None, :, 1]
        bottom = gt_bboxes[None, :, 3] - ys
        bbox_targets = jnp.stack([left, top, right, bottom], -1)
        inside = bbox_targets.min(-1) > 0.01
        max_dist = bbox_targets.max(-1)
        in_range = (max_dist >= regress_ranges[:, 0:1]) & \
            (max_dist <= regress_ranges[:, 1:2])
        ok = inside & in_range & gt_valid[None, :]
        cand_areas = jnp.where(ok, areas[None, :], INF)
        min_area_idx = cand_areas.argmin(-1)
        min_area = cand_areas.min(-1)
        pos = min_area < INF
        labels = jnp.where(pos, take_rows(gt_labels, min_area_idx),
                           self.background_label).astype(jnp.int32)
        tgt = take_rows(bbox_targets.swapaxes(0, 1), min_area_idx,
                per_row=True)
        return labels, tgt, pos

    def loss(self, cls_scores, bbox_preds, centernesses, gt_bboxes, gt_valid,
             gt_labels, img_shapes, key=None):
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        points = self._points(featmap_sizes)
        all_points = jnp.asarray(np.concatenate(points, 0))
        rr = np.concatenate([
            np.tile(np.asarray(r, np.float32), (len(p), 1))
            for r, p in zip(self.regress_ranges, points)])
        rr = jnp.asarray(rr)
        b = cls_scores[0].shape[0]

        def tgt(gb, gv, gl):
            return self._targets_single(all_points, rr, gb, gv, gl)

        labels, bbox_targets, pos = jax.vmap(tgt)(gt_bboxes, gt_valid,
                                                  gt_labels)

        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.num_classes) for s in cls_scores],
            1).reshape(-1, self.num_classes)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1).reshape(-1, 4)
        cent_flat = jnp.concatenate(
            [c.reshape(b, -1) for c in centernesses], 1).reshape(-1)
        labels = labels.reshape(-1)
        bbox_targets = bbox_targets.reshape(-1, 4)
        pos = pos.reshape(-1)

        num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)
        loss_cls = self.loss_cls(cls_flat, labels, avg_factor=num_pos)

        # centerness targets (ref: fcos_head.py centerness_target)
        lr = bbox_targets[:, [0, 2]]
        tb = bbox_targets[:, [1, 3]]
        ctr = jnp.sqrt(jnp.clip(
            (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6)) *
            (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0, 1))
        pts_rep = jnp.tile(all_points, (b, 1))
        decoded_pred = distance2bbox(pts_rep, box_flat)
        decoded_tgt = distance2bbox(pts_rep, bbox_targets)
        w = pos.astype(jnp.float32)
        loss_bbox = self.loss_bbox(decoded_pred, decoded_tgt, weight=w * ctr,
                                   avg_factor=jnp.maximum(
                                       (w * ctr).sum(), 1e-6))
        loss_centerness = self.loss_centerness(
            cent_flat, ctr, weight=w, avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_centerness=loss_centerness)
"""RepPoints head (ref: mmdet/models/dense_heads/reppoints_head.py:12-776).

Two-stage point refinement: an init branch predicts 9 offset points per
location, which (a) feed a DCN as its offsets for the cls/refine branches
and (b) convert to boxes via minmax/partial_minmax/moment transforms.

TPU-native departures:
- NHWC throughout; the DCN offset layout matches ops.deform_conv2d's
  (tap, (dy, dx)) channel order, which equals the reference's.
- targets are mask-based over padded gts (PointAssigner for init,
  MaxIoUAssigner for refine), vmapped over the batch.
- the per-level loss normalization (point_base_scale * stride) is applied
  per point via a flat stride vector so levels can be concatenated.
- because the head is functional, the learnable ``moment_transfer`` is
  threaded through the output tuple so ``loss``/``get_bboxes`` see it.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchor.generator import PointGenerator
from ...core.post.bbox_nms import multiclass_nms
from ...registry import (BBOX_ASSIGNERS, HEADS, LOSSES, build_from_cfg)
from ..layers import Conv2d, ConvModule, Module, take_rows


@HEADS.register_module()
class RepPointsHead(Module):
    def __init__(self, num_classes, in_channels, feat_channels=256,
                 point_feat_channels=256, stacked_convs=3, num_points=9,
                 gradient_mul=0.1, point_strides=(8, 16, 32, 64, 128),
                 point_base_scale=4, conv_cfg=None, norm_cfg=None,
                 background_label=None, loss_cls=None, loss_bbox_init=None,
                 loss_bbox_refine=None, use_grid_points=False,
                 center_init=True, transform_method='moment',
                 moment_mul=0.01, train_cfg=None, test_cfg=None):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        self.point_feat_channels = point_feat_channels
        self.stacked_convs = stacked_convs
        self.num_points = num_points
        self.gradient_mul = gradient_mul
        self.point_strides = point_strides
        self.point_base_scale = point_base_scale
        self.norm_cfg = norm_cfg
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        self.background_label = (num_classes if background_label is None
                                 else background_label)
        loss_cls = loss_cls or dict(type='FocalLoss', use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0)
        self.use_sigmoid_cls = loss_cls.get('use_sigmoid', False)
        self.sampling = loss_cls['type'] not in ['FocalLoss']
        self.loss_cls = build_from_cfg(loss_cls, LOSSES)
        self.loss_bbox_init = build_from_cfg(loss_bbox_init or dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=0.5), LOSSES)
        self.loss_bbox_refine = build_from_cfg(loss_bbox_refine or dict(
            type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=1.0), LOSSES)
        if train_cfg is not None:
            self.init_assigner = build_from_cfg(
                train_cfg['init']['assigner'], BBOX_ASSIGNERS)
            self.refine_assigner = build_from_cfg(
                train_cfg['refine']['assigner'], BBOX_ASSIGNERS)
        self.use_grid_points = use_grid_points
        self.center_init = center_init
        self.transform_method = transform_method
        self.moment_mul = moment_mul
        self.cls_out_channels = (num_classes if self.use_sigmoid_cls
                                 else num_classes + 1)
        self.point_generator = PointGenerator()
        self.dcn_kernel = int(np.sqrt(num_points))
        self.dcn_pad = (self.dcn_kernel - 1) // 2
        assert self.dcn_kernel * self.dcn_kernel == num_points
        assert self.dcn_kernel % 2 == 1
        dcn_base = np.arange(-self.dcn_pad, self.dcn_pad + 1,
                             dtype=np.float32)
        dcn_base_y = np.repeat(dcn_base, self.dcn_kernel)
        dcn_base_x = np.tile(dcn_base, self.dcn_kernel)
        # per-tap (y, x) pairs, flattened (ref: reppoints_head.py:121-127)
        self.dcn_base_offset = jnp.asarray(
            np.stack([dcn_base_y, dcn_base_x], axis=1).reshape(1, 1, 1, -1))
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
        pts_out_dim = 4 if self.use_grid_points else 2 * self.num_points
        # DCN weight holder (offsets supplied externally)
        self.reppoints_cls_conv = Conv2d(
            self.feat_channels, self.point_feat_channels, self.dcn_kernel,
            padding=self.dcn_pad, bias=False, weight_init='normal',
            init_std=0.01)
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.reppoints_cls_out = Conv2d(
            self.point_feat_channels, self.cls_out_channels, 1,
            weight_init='normal', init_std=0.01, bias_value=bias_cls)
        self.reppoints_pts_init_conv = Conv2d(
            self.feat_channels, self.point_feat_channels, 3, padding=1,
            weight_init='normal', init_std=0.01)
        self.reppoints_pts_init_out = Conv2d(
            self.point_feat_channels, pts_out_dim, 1,
            weight_init='normal', init_std=0.01)
        self.reppoints_pts_refine_conv = Conv2d(
            self.feat_channels, self.point_feat_channels, self.dcn_kernel,
            padding=self.dcn_pad, bias=False, weight_init='normal',
            init_std=0.01)
        self.reppoints_pts_refine_out = Conv2d(
            self.point_feat_channels, pts_out_dim, 1,
            weight_init='normal', init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs + 6)
        it = iter(keys)
        p = {'cls_convs': {str(i): m.init(next(it))
                           for i, m in enumerate(self.cls_convs)},
             'reg_convs': {str(i): m.init(next(it))
                           for i, m in enumerate(self.reg_convs)},
             'reppoints_cls_conv': self.reppoints_cls_conv.init(next(it)),
             'reppoints_cls_out': self.reppoints_cls_out.init(next(it)),
             'reppoints_pts_init_conv':
                 self.reppoints_pts_init_conv.init(next(it)),
             'reppoints_pts_init_out':
                 self.reppoints_pts_init_out.init(next(it)),
             'reppoints_pts_refine_conv':
                 self.reppoints_pts_refine_conv.init(next(it)),
             'reppoints_pts_refine_out':
                 self.reppoints_pts_refine_out.init(next(it))}
        if self.transform_method == 'moment':
            p['moment_transfer'] = jnp.zeros((2,), jnp.float32)
        return p

    # ------------------------------------------------------------------

    def points2bbox(self, pts, moment=None, y_first=True):
        """pts (..., 2n) -> boxes (..., 4) (ref: reppoints_head.py:185-234)."""
        shape = pts.shape[:-1]
        pr = pts.reshape(shape + (-1, 2))
        pts_y = pr[..., 0] if y_first else pr[..., 1]
        pts_x = pr[..., 1] if y_first else pr[..., 0]
        if self.transform_method == 'minmax':
            bbox = jnp.stack([pts_x.min(-1), pts_y.min(-1),
                              pts_x.max(-1), pts_y.max(-1)], -1)
        elif self.transform_method == 'partial_minmax':
            px = pts_x[..., :4]
            py = pts_y[..., :4]
            bbox = jnp.stack([px.min(-1), py.min(-1),
                              px.max(-1), py.max(-1)], -1)
        elif self.transform_method == 'moment':
            ym = pts_y.mean(-1)
            xm = pts_x.mean(-1)
            n = pts_y.shape[-1]
            # torch.std is Bessel-corrected
            ys = jnp.sqrt(((pts_y - ym[..., None]) ** 2).sum(-1)
                          / max(n - 1, 1))
            xs = jnp.sqrt(((pts_x - xm[..., None]) ** 2).sum(-1)
                          / max(n - 1, 1))
            mt = (moment * self.moment_mul
                  + jax.lax.stop_gradient(moment) * (1 - self.moment_mul))
            hw = xs * jnp.exp(mt[0])
            hh = ys * jnp.exp(mt[1])
            bbox = jnp.stack([xm - hw, ym - hh, xm + hw, ym + hh], -1)
        else:
            raise NotImplementedError(self.transform_method)
        return bbox

    def gen_grid_from_reg(self, reg, previous_boxes):
        """(ref: reppoints_head.py:236-268), NHWC."""
        k = self.dcn_kernel
        bxy = (previous_boxes[..., :2] + previous_boxes[..., 2:]) / 2.
        bwh = jnp.clip(previous_boxes[..., 2:] - previous_boxes[..., :2],
                       1e-6, None)
        tl = bxy + bwh * reg[..., :2] - 0.5 * bwh * jnp.exp(reg[..., 2:])
        wh = bwh * jnp.exp(reg[..., 2:])
        iv = jnp.linspace(0., 1., k)
        gx = tl[..., 0:1] + wh[..., 0:1] * iv                  # (..., k)
        gy = tl[..., 1:2] + wh[..., 1:2] * iv
        # tap t = i*k + j -> (y_i, x_j), interleaved (y, x)
        y_t = jnp.repeat(gy, k, axis=-1)
        x_t = jnp.tile(gx, (1,) * (gx.ndim - 1) + (k,))
        grid_yx = jnp.stack([y_t, x_t], -1).reshape(
            reg.shape[:-1] + (2 * k * k,))
        regressed = jnp.concatenate(
            [tl, tl + wh], -1)
        return grid_yx, regressed

    def forward_single(self, params, x):
        from ...ops.deform_conv import deform_conv2d
        dcn_base = self.dcn_base_offset.astype(jnp.float32)
        if self.use_grid_points or not self.center_init:
            scale = self.point_base_scale / 2
            points_init = dcn_base / jnp.abs(dcn_base).max() * scale
            bbox_init = jnp.asarray([-scale, -scale, scale, scale],
                                    jnp.float32).reshape(1, 1, 1, 4)
        else:
            points_init = 0.
        cls_feat = x
        pts_feat = x
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        for i, m in enumerate(self.reg_convs):
            pts_feat = m(params['reg_convs'][str(i)], pts_feat)
        pts_out_init = self.reppoints_pts_init_out(
            params['reppoints_pts_init_out'],
            jax.nn.relu(self.reppoints_pts_init_conv(
                params['reppoints_pts_init_conv'], pts_feat)))
        if self.use_grid_points:
            pts_out_init, bbox_out_init = self.gen_grid_from_reg(
                pts_out_init, jax.lax.stop_gradient(
                    jnp.broadcast_to(bbox_init,
                                     pts_out_init.shape[:-1] + (4,))))
        else:
            pts_out_init = pts_out_init + points_init
        gm = self.gradient_mul
        pts_gm = (1 - gm) * jax.lax.stop_gradient(pts_out_init) \
            + gm * pts_out_init
        dcn_offset = (pts_gm - dcn_base).astype(x.dtype)
        cls_out = self.reppoints_cls_out(
            params['reppoints_cls_out'],
            jax.nn.relu(deform_conv2d(
                cls_feat, dcn_offset,
                params['reppoints_cls_conv']['weight'].astype(x.dtype),
                padding=self.dcn_pad)))
        pts_out_refine = self.reppoints_pts_refine_out(
            params['reppoints_pts_refine_out'],
            jax.nn.relu(deform_conv2d(
                pts_feat, dcn_offset,
                params['reppoints_pts_refine_conv']['weight'].astype(
                    x.dtype),
                padding=self.dcn_pad)))
        if self.use_grid_points:
            pts_out_refine, _ = self.gen_grid_from_reg(
                pts_out_refine, jax.lax.stop_gradient(bbox_out_init))
        else:
            pts_out_refine = pts_out_refine \
                + jax.lax.stop_gradient(pts_out_init)
        return cls_out, pts_out_init, pts_out_refine

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f) for f in feats]
        moment = params.get('moment_transfer',
                            jnp.zeros((2,), jnp.float32))
        return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                tuple(o[2] for o in outs), moment)

    # ------------------------------------------------------------------

    def _flat_points(self, featmap_sizes):
        pts = [self.point_generator.grid_points(fs, s)
               for fs, s in zip(featmap_sizes, self.point_strides)]
        return np.concatenate(pts, axis=0)                     # (N, 3)

    def _offsets_to_pts(self, pts_preds, featmap_sizes, b):
        """Raw per-level NHWC offsets -> flat xy point coords (B, N, 2n)
        (ref: offset_to_pts, reppoints_head.py:370-390)."""
        out = []
        for lvl, (pred, fs) in enumerate(zip(pts_preds, featmap_sizes)):
            stride = self.point_strides[lvl]
            pts = self.point_generator.grid_points(fs, stride)  # (P, 3)
            center = jnp.asarray(np.tile(pts[:, :2], self.num_points))
            yx = pred.reshape(b, -1, 2 * self.num_points)
            y = yx[..., 0::2]
            x = yx[..., 1::2]
            xy = jnp.stack([x, y], -1).reshape(b, -1, 2 * self.num_points)
            out.append(xy * stride + center[None])
        return jnp.concatenate(out, axis=1)                    # (B, N, 2n)

    def _stage_targets(self, assigner, pos_weight, proposals, gt_bboxes,
                       gt_valid, gt_labels):
        """Per-image static targets (ref: _point_target_single,
        reppoints_head.py:392-460)."""
        n = proposals.shape[0]
        res = assigner.assign(proposals, gt_bboxes, gt_valid, gt_labels)
        assigned = res['assigned_gt_inds']
        pos = assigned > 0
        neg = assigned == 0
        safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        bbox_gt = jnp.where(pos[:, None], take_rows(gt_bboxes, safe), 0.0)
        labels = jnp.where(pos, take_rows(gt_labels, safe),
                           self.background_label).astype(jnp.int32)
        pw = 1.0 if pos_weight <= 0 else pos_weight
        label_weights = jnp.where(pos, pw, 0.0)
        label_weights = jnp.where(neg, 1.0, label_weights)
        bbox_weights = jnp.where(pos[:, None], 1.0,
                                 jnp.zeros((n, 4), jnp.float32))
        return labels, label_weights, bbox_gt, bbox_weights, pos.sum()

    def loss(self, cls_scores, pts_preds_init, pts_preds_refine, moment,
             gt_bboxes, gt_valid, gt_labels, img_shapes, key=None):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        pts_preds_init = [p.astype(jnp.float32) for p in pts_preds_init]
        pts_preds_refine = [p.astype(jnp.float32) for p in pts_preds_refine]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        b = cls_scores[0].shape[0]
        flat_pts = self._flat_points(featmap_sizes)            # (N, 3) np
        points_j = jnp.asarray(flat_pts)
        strides = jnp.asarray(flat_pts[:, 2])                  # (N,)
        norm = (self.point_base_scale * strides)[:, None]      # (N, 1)

        pts_coord_init = self._offsets_to_pts(pts_preds_init,
                                              featmap_sizes, b)
        pts_coord_refine = self._offsets_to_pts(pts_preds_refine,
                                                featmap_sizes, b)

        # ---- init-stage candidates ----
        init_cfg = self.train_cfg['init']
        if init_cfg['assigner']['type'] == 'PointAssigner':
            init_proposals = jnp.broadcast_to(
                points_j[None], (b,) + points_j.shape)
        else:
            scale = self.point_base_scale * strides[:, None] * 0.5
            centers = jnp.concatenate([points_j[:, :2]] * 2, -1)
            boxes = centers + jnp.concatenate([-scale, -scale, scale,
                                               scale], -1)
            init_proposals = jnp.broadcast_to(boxes[None], (b,) + boxes.shape)

        def init_tgt(props, gb, gv, gl):
            return self._stage_targets(self.init_assigner,
                                       init_cfg.get('pos_weight', -1),
                                       props, gb, gv, gl)
        (_, _, bbox_gt_init, bbox_w_init, npos_init) = jax.vmap(init_tgt)(
            init_proposals, gt_bboxes, gt_valid, gt_labels)
        num_init = jnp.maximum(npos_init, 1).sum().astype(jnp.float32)

        # ---- refine-stage candidates: boxes decoded from detached init
        # preds (ref: reppoints_head.py:628-639) ----
        centers_xyxy = jnp.concatenate([points_j[:, :2]] * 2, -1)
        box_l = []
        for lvl, pred in enumerate(pts_preds_init):
            raw = jax.lax.stop_gradient(pred).reshape(
                b, -1, 2 * self.num_points)
            bb = self.points2bbox(raw, moment=jax.lax.stop_gradient(moment),
                                  y_first=True)
            box_l.append(bb * self.point_strides[lvl])
        shift = jnp.concatenate(box_l, 1)                      # (B, N, 4)
        refine_proposals = centers_xyxy[None] + shift

        refine_cfg = self.train_cfg['refine']

        def refine_tgt(props, gb, gv, gl):
            return self._stage_targets(self.refine_assigner,
                                       refine_cfg.get('pos_weight', -1),
                                       props, gb, gv, gl)
        (labels, label_w, bbox_gt_ref, bbox_w_ref, npos_ref) = jax.vmap(
            refine_tgt)(refine_proposals, gt_bboxes, gt_valid, gt_labels)
        num_refine = jnp.maximum(npos_ref, 1).sum().astype(jnp.float32)

        # ---- losses over concatenated levels ----
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            1).reshape(-1, self.cls_out_channels)
        loss_cls = self.loss_cls(cls_flat, labels.reshape(-1),
                                 label_w.reshape(-1), avg_factor=num_refine)

        bbox_pred_init = self.points2bbox(
            pts_coord_init.reshape(-1, 2 * self.num_points), moment=moment,
            y_first=False)
        bbox_pred_refine = self.points2bbox(
            pts_coord_refine.reshape(-1, 2 * self.num_points), moment=moment,
            y_first=False)
        norm_b = jnp.tile(norm, (b, 1))
        loss_pts_init = self.loss_bbox_init(
            bbox_pred_init / norm_b,
            bbox_gt_init.reshape(-1, 4) / norm_b,
            bbox_w_init.reshape(-1, 4), avg_factor=num_init)
        loss_pts_refine = self.loss_bbox_refine(
            bbox_pred_refine / norm_b,
            bbox_gt_ref.reshape(-1, 4) / norm_b,
            bbox_w_ref.reshape(-1, 4), avg_factor=num_refine)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_pts_init,
                    loss_pts_refine=loss_pts_refine)

    # ------------------------------------------------------------------

    def get_bboxes(self, cls_scores, pts_preds_init, pts_preds_refine,
                   moment, img_shapes, scale_factors, cfg=None,
                   rescale=False):
        cfg = self.test_cfg if cfg is None else cfg
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        b = cls_scores[0].shape[0]
        nms_pre = cfg.get('nms_pre', -1)
        probs_l, boxes_l = [], []
        for lvl, (cls_score, pts_ref) in enumerate(
                zip(cls_scores, pts_preds_refine)):
            stride = self.point_strides[lvl]
            fs = (cls_score.shape[1], cls_score.shape[2])
            pts = self.point_generator.grid_points(fs, stride)
            centers = jnp.asarray(
                np.concatenate([pts[:, :2], pts[:, :2]], -1))
            scores = cls_score.reshape(b, -1, self.cls_out_channels)
            if self.use_sigmoid_cls:
                scores = jax.nn.sigmoid(scores)
            else:
                scores = jax.nn.softmax(scores, -1)
            preds = self.points2bbox(
                pts_ref.astype(jnp.float32).reshape(
                    b, -1, 2 * self.num_points),
                moment=moment, y_first=True)
            hwa = scores.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                max_scores = (scores.max(-1) if self.use_sigmoid_cls
                              else scores[..., :-1].max(-1))
                _, idx = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, idx[..., None], 1)
                preds = jnp.take_along_axis(preds, idx[..., None], 1)
                ctr = centers[idx]
            else:
                ctr = jnp.broadcast_to(centers[None], (b, hwa, 4))
            bboxes = preds * stride + ctr

            def _clip(bb, shape):
                return jnp.stack(
                    [jnp.clip(bb[:, 0], 0, shape[1]),
                     jnp.clip(bb[:, 1], 0, shape[0]),
                     jnp.clip(bb[:, 2], 0, shape[1]),
                     jnp.clip(bb[:, 3], 0, shape[0])], -1)

            bboxes = jax.vmap(_clip)(bboxes, img_shapes)
            probs_l.append(scores)
            boxes_l.append(bboxes)
        probs = jnp.concatenate(probs_l, 1)
        boxes = jnp.concatenate(boxes_l, 1)
        if rescale:
            boxes = boxes / scale_factors[:, None, :4]
        if self.use_sigmoid_cls:
            padding = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)
            probs = jnp.concatenate([probs, padding], -1)

        def _one(bb, ss):
            return multiclass_nms(bb, ss, cfg['score_thr'], cfg['nms'],
                                  cfg['max_per_img'],
                                  pre_nms_cap=cfg.get('nms_cap', 2000))

        return jax.vmap(_one)(boxes, probs)

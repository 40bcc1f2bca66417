"""ATSS head (ref: mmdet/models/dense_heads/atss_head.py:21-484).

Anchor-based head with FCOS-style structure (GN tower, per-level scale,
centerness on the reg branch) and Adaptive Training Sample Selection.
Includes the ARFE fork's "recitify" tweak: per-level bbox losses are
rescaled by stop-grad(cls_loss/bbox_loss) (ref: atss_head.py:225-228).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS, LOSSES, build_from_cfg
from ..layers import Conv2d, ConvModule, take_rows
from .anchor_head import AnchorHead, anchor_inside_flags


@HEADS.register_module()
class ATSSHead(AnchorHead):
    def __init__(self, num_classes, in_channels, stacked_convs=4,
                 conv_cfg=None, norm_cfg=None, loss_centerness=None,
                 **kwargs):
        self.stacked_convs = stacked_convs
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg if norm_cfg is not None else \
            dict(type='GN', num_groups=32, requires_grad=True)
        super().__init__(num_classes, in_channels, **kwargs)
        self.sampling = False
        self.loss_centerness = build_from_cfg(loss_centerness or dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0),
            LOSSES)

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
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.atss_cls = Conv2d(
            self.feat_channels, self.num_anchors * self.cls_out_channels, 3,
            padding=1, weight_init='normal', init_std=0.01,
            bias_value=bias_cls)
        self.atss_reg = Conv2d(self.feat_channels, self.num_anchors * 4, 3,
                               padding=1, weight_init='normal', init_std=0.01)
        self.atss_centerness = Conv2d(self.feat_channels, self.num_anchors, 3,
                                      padding=1, weight_init='normal',
                                      init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs + 3)
        return {
            'cls_convs': {str(i): m.init(keys[i])
                          for i, m in enumerate(self.cls_convs)},
            'reg_convs': {str(i): m.init(keys[self.stacked_convs + i])
                          for i, m in enumerate(self.reg_convs)},
            'atss_cls': self.atss_cls.init(keys[-3]),
            'atss_reg': self.atss_reg.init(keys[-2]),
            'atss_centerness': self.atss_centerness.init(keys[-1]),
            'scales': jnp.ones(
                (len(self.anchor_generator.strides),), jnp.float32),
        }

    def forward_single(self, params, x, lvl):
        cls_feat = x
        reg_feat = x
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        for i, m in enumerate(self.reg_convs):
            reg_feat = m(params['reg_convs'][str(i)], reg_feat)
        cls_score = self.atss_cls(params['atss_cls'], cls_feat)
        # no exp on bbox_pred, plain per-level scale (ref :106-117)
        bbox_pred = params['scales'][lvl] * self.atss_reg(params['atss_reg'],
                                                          reg_feat)
        centerness = self.atss_centerness(params['atss_centerness'], reg_feat)
        return cls_score, bbox_pred, centerness

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f, i)
                for i, f in enumerate(feats)]
        return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                tuple(o[2] for o in outs))

    def centerness_target(self, anchors, gts):
        """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) from the anchor
        center to the decoded gt box (ref :235-251)."""
        cx = (anchors[..., 2] + anchors[..., 0]) * 0.5
        cy = (anchors[..., 3] + anchors[..., 1]) * 0.5
        l_ = cx - gts[..., 0]
        t_ = cy - gts[..., 1]
        r_ = gts[..., 2] - cx
        b_ = gts[..., 3] - cy
        lr_min = jnp.minimum(l_, r_)
        lr_max = jnp.maximum(jnp.maximum(l_, r_), 1e-6)
        tb_min = jnp.minimum(t_, b_)
        tb_max = jnp.maximum(jnp.maximum(t_, b_), 1e-6)
        return jnp.sqrt(jnp.clip((lr_min / lr_max) * (tb_min / tb_max),
                                 0.0, None))

    def _atss_targets_single(self, anchors, flags, level_sizes, gt_bboxes,
                             gt_valid, gt_labels, img_shape):
        cfg = self.train_cfg
        inside = anchor_inside_flags(anchors, flags, img_shape,
                                     cfg.get('allowed_border', -1))
        res = self.assigner.assign(anchors, level_sizes, gt_bboxes, gt_valid,
                                   gt_labels, box_valid=inside)
        assigned = res['assigned_gt_inds']
        pos = assigned > 0
        n = anchors.shape[0]
        safe = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        matched_gt = take_rows(gt_bboxes, safe)
        bbox_targets = jnp.where(pos[:, None],
                                 self.bbox_coder.encode(anchors, matched_gt),
                                 jnp.zeros((n, 4), jnp.float32))
        labels = jnp.where(pos, take_rows(gt_labels.astype(jnp.int32), safe),
                           self.background_label)
        pos_w = cfg.get('pos_weight', -1)
        pos_w = 1.0 if pos_w <= 0 else pos_w
        label_weights = jnp.where(pos, pos_w,
                                  jnp.where(assigned == 0, 1.0, 0.0))
        return (labels.astype(jnp.int32), label_weights, bbox_targets, pos,
                jnp.maximum(pos.sum(), 1))

    def loss(self, cls_scores, bbox_preds, centernesses, gt_bboxes, gt_valid,
             gt_labels, img_shapes, key=None):
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        centernesses = [cn.astype(jnp.float32) for cn in centernesses]
        b = cls_scores[0].shape[0]
        c = self.cls_out_channels
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        level_sizes = [a.shape[0] for a in mlvl_anchors]
        anchors = jnp.asarray(np.concatenate(mlvl_anchors, 0))
        pad_shape = (featmap_sizes[0][0] * self.anchor_generator.strides[0][0],
                     featmap_sizes[0][1] * self.anchor_generator.strides[0][1])
        flags = jnp.asarray(np.concatenate(
            self.anchor_generator.valid_flags(featmap_sizes, pad_shape)))

        def tgt(gb, gv, gl, shape):
            return self._atss_targets_single(anchors, flags, level_sizes, gb,
                                             gv, gl, shape)

        labels, label_weights, bbox_targets, pos, npos = jax.vmap(tgt)(
            gt_bboxes, gt_valid, gt_labels, img_shapes)
        num_total_samples = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)

        anc_b = jnp.broadcast_to(anchors[None], (b,) + anchors.shape)
        decoded_tgt = self.bbox_coder.decode(anc_b, bbox_targets)
        ctr_tgt = self.centerness_target(anc_b, decoded_tgt)
        preds_cat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], 1)
        decoded_pred = self.bbox_coder.decode(anc_b, preds_cat)
        cls_cat = jnp.concatenate(
            [s.reshape(b, -1, c) for s in cls_scores], 1)
        cent_cat = jnp.concatenate(
            [cn.reshape(b, -1) for cn in centernesses], 1)

        pos_f = pos.astype(jnp.float32)
        bbox_avg_factor = jnp.maximum((ctr_tgt * pos_f).sum(), 1e-7)

        # per-level losses so the fork's recitify reweighting can apply
        loss_cls_l, loss_bbox_l, loss_cent = [], [], 0.0
        start = 0
        for nl in level_sizes:
            sl = slice(start, start + nl)
            lc = self.loss_cls(
                cls_cat[:, sl].reshape(-1, c), labels[:, sl].reshape(-1),
                label_weights[:, sl].reshape(-1),
                avg_factor=num_total_samples)
            lb = self.loss_bbox(
                decoded_pred[:, sl].reshape(-1, 4),
                decoded_tgt[:, sl].reshape(-1, 4),
                weight=(ctr_tgt * pos_f)[:, sl].reshape(-1),
                avg_factor=1.0) / bbox_avg_factor
            lcn = self.loss_centerness(
                cent_cat[:, sl].reshape(-1), ctr_tgt[:, sl].reshape(-1),
                weight=pos_f[:, sl].reshape(-1),
                avg_factor=num_total_samples)
            loss_cls_l.append(lc)
            loss_bbox_l.append(lb)
            loss_cent = loss_cent + lcn
            start += nl

        # ARFE recitify: bbox_l *= stop_grad(cls_l / (bbox_l + eps))
        # (ref: atss_head.py:225-228)
        loss_bbox = 0.0
        for lc, lb in zip(loss_cls_l, loss_bbox_l):
            wc = jax.lax.stop_gradient(lc / (lb + 1e-7))
            loss_bbox = loss_bbox + lb * wc
        return dict(loss_cls=sum(loss_cls_l), loss_bbox=loss_bbox,
                    loss_centerness=loss_cent)

    def get_bboxes(self, cls_scores, bbox_preds, centernesses, img_shapes,
                   scale_factors, cfg=None, rescale=False):
        """Centerness-weighted decode + NMS (ref :253-345)."""
        from ...core.post.bbox_nms import multiclass_nms
        cfg = self.test_cfg if cfg is None else cfg
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        centernesses = [cn.astype(jnp.float32) for cn in centernesses]
        b = cls_scores[0].shape[0]
        c = self.cls_out_channels
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)

        probs_l, boxes_l, cent_l = [], [], []
        for cls_score, bbox_pred, cent, anchors in zip(
                cls_scores, bbox_preds, centernesses, mlvl_anchors):
            scores = jax.nn.sigmoid(cls_score.reshape(b, -1, c))
            cent_s = jax.nn.sigmoid(cent.reshape(b, -1))
            preds = bbox_pred.reshape(b, -1, 4)
            anc = jnp.asarray(anchors)
            hwa = scores.shape[1]
            if nms_pre > 0 and hwa > nms_pre:
                max_scores = (scores * cent_s[..., None]).max(-1)
                _, idx = jax.lax.top_k(max_scores, nms_pre)
                scores = jnp.take_along_axis(scores, idx[..., None], 1)
                cent_s = jnp.take_along_axis(cent_s, idx, 1)
                preds = jnp.take_along_axis(preds, idx[..., None], 1)
                anc_b = anc[idx]
            else:
                anc_b = jnp.broadcast_to(anc[None], (b, hwa, 4))
            boxes = jax.vmap(
                lambda a_, p_, sh: self.bbox_coder.decode(a_, p_,
                                                          max_shape=sh))(
                anc_b, preds, img_shapes)
            probs_l.append(scores)
            boxes_l.append(boxes)
            cent_l.append(cent_s)
        return self._cent_tail(probs_l, boxes_l, cent_l, scale_factors, cfg,
                               rescale)

    def _cent_tail(self, probs_l, boxes_l, cent_l, scale_factors, cfg,
                   rescale):
        """Shared rescale + centerness-weighted multiclass-NMS tail."""
        from ...core.post.bbox_nms import multiclass_nms
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
    # channel-major inference (see AnchorHead.get_bboxes_feats). The
    # 4-channel reg and 1-channel centerness maps lane-pad to 128 in NHWC;
    # here the finals run NCHW-out (reg + centerness share the reg tower ->
    # one stacked conv) and only top-k candidates are gathered.
    # ------------------------------------------------------------------

    cm_finals = True

    def get_bboxes_feats(self, params, feats, img_shapes, scale_factors,
                         cfg=None, rescale=False):
        cfg = self.test_cfg if cfg is None else cfg
        featmap_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        c = self.cls_out_channels
        probs_l, boxes_l, cent_l = [], [], []
        for lvl, (x, anchors) in enumerate(zip(feats, mlvl_anchors)):
            cls_feat = x
            reg_feat = x
            for i, m in enumerate(self.cls_convs):
                cls_feat = m(params['cls_convs'][str(i)], cls_feat)
            for i, m in enumerate(self.reg_convs):
                reg_feat = m(params['reg_convs'][str(i)], reg_feat)
            pc = params['atss_cls']
            pr = params['atss_reg']
            pn = params['atss_centerness']
            num_a = self.num_anchors
            cls_t = self._conv_cm(
                cls_feat, pc['weight'], pc['bias']).astype(jnp.float32)
            # reg + centerness share the reg tower -> one stacked conv
            w = jnp.concatenate([pr['weight'], pn['weight']], axis=-1)
            bias = jnp.concatenate([pr['bias'], pn['bias']])
            out = self._conv_cm(reg_feat, w, bias).astype(jnp.float32)
            b, hw = out.shape[0], out.shape[-1]
            reg_t = params['scales'][lvl].astype(jnp.float32) \
                * out[:, :num_a * 4].reshape(b, num_a, 4, hw)
            cent_t = out[:, num_a * 4:].reshape(b, num_a, 1, hw)
            cls_t = cls_t.reshape(b, num_a, c, hw)
            scores_t = jax.nn.sigmoid(cls_t)
            cent_s = jax.nn.sigmoid(cent_t[:, :, 0])        # (B, A, HW)
            # anchor-major candidate order; trace-time constant fold
            anc = jnp.asarray(anchors).reshape(hw, num_a, 4) \
                .transpose(1, 0, 2).reshape(num_a * hw, 4)
            hwa = num_a * hw
            if nms_pre > 0 and hwa > nms_pre:
                max_sc = (scores_t.max(axis=2) * cent_s).reshape(b, hwa)
                _, idx = jax.lax.top_k(max_sc, nms_pre)
                a_idx, x_idx = idx // hw, idx % hw

                def _gather(t, ai, xi):                 # (A,C,HW) -> (P,C)
                    return t[ai, :, xi]

                scores_g = jax.vmap(_gather)(scores_t, a_idx, x_idx)
                preds_g = jax.vmap(_gather)(reg_t, a_idx, x_idx)
                cent_g = jnp.take_along_axis(
                    cent_s.reshape(b, hwa), idx, 1)
                anc_b = anc[idx]
            else:
                scores_g = scores_t.transpose(0, 1, 3, 2).reshape(b, hwa, c)
                preds_g = reg_t.transpose(0, 1, 3, 2).reshape(b, hwa, 4)
                cent_g = cent_s.reshape(b, hwa)
                anc_b = jnp.broadcast_to(anc[None], (b, hwa, 4))
            boxes = jax.vmap(
                lambda a_, p_, sh: self.bbox_coder.decode(a_, p_,
                                                          max_shape=sh))(
                    anc_b, preds_g, img_shapes)
            probs_l.append(scores_g)
            boxes_l.append(boxes)
            cent_l.append(cent_g)
        return self._cent_tail(probs_l, boxes_l, cent_l, scale_factors, cfg,
                               rescale)

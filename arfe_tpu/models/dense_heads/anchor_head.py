"""Anchor-based dense head (functional, static-shape).

TPU-native counterpart of ref: mmdet/models/dense_heads/anchor_head.py:13-553.
Key departures from the reference, by design:
- ``get_bboxes`` is fully batched and static-shape: per-level ``nms_pre``
  top-k uses fixed k, NMS has fixed output capacity with validity masks, so
  the whole decode+NMS path lives inside one jit with no host round-trips.
- feature maps are NHWC; flattening (H, W, A*C) -> (H*W*A, C) yields the same
  row order as the reference's permute(1,2,0).reshape (h-major, then w, a).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from ...core.bbox.coder import delta2bbox
from ...core.post.bbox_nms import multiclass_nms
from ...registry import (ANCHOR_GENERATORS, BBOX_ASSIGNERS, BBOX_CODERS,
                         BBOX_SAMPLERS, HEADS, LOSSES, build_from_cfg)
from ..layers import Conv2d, Module, take_rows


def anchor_inside_flags(flat_anchors, valid_flags, img_shape,
                        allowed_border=0):
    """(ref: mmdet/core/anchor/utils.py:20-35)."""
    if allowed_border < 0:
        return valid_flags
    h, w = img_shape[0], img_shape[1]
    inside = ((flat_anchors[:, 0] >= -allowed_border)
              & (flat_anchors[:, 1] >= -allowed_border)
              & (flat_anchors[:, 2] < w + allowed_border)
              & (flat_anchors[:, 3] < h + allowed_border))
    return valid_flags & inside


@HEADS.register_module()
class AnchorHead(Module):
    def __init__(self, num_classes, in_channels, feat_channels=256,
                 anchor_generator=None, bbox_coder=None,
                 reg_decoded_bbox=False, background_label=None,
                 loss_cls=None, loss_bbox=None, train_cfg=None,
                 test_cfg=None):
        self.num_classes = num_classes
        self.in_channels = in_channels
        self.feat_channels = feat_channels
        loss_cls = loss_cls or dict(type='CrossEntropyLoss',
                                    use_sigmoid=True, loss_weight=1.0)
        loss_bbox = loss_bbox or dict(type='SmoothL1Loss', beta=1.0 / 9.0,
                                      loss_weight=1.0)
        self.use_sigmoid_cls = loss_cls.get('use_sigmoid', False)
        self.sampling = loss_cls.get('type') not in \
            ('FocalLoss', 'GHMC', 'QualityFocalLoss')
        self.cls_out_channels = (num_classes if self.use_sigmoid_cls
                                 else num_classes + 1)
        # BG label is num_classes since v2.0 (ref: anchor_head.py:64-69)
        self.background_label = (num_classes if background_label is None
                                 else background_label)
        self.reg_decoded_bbox = reg_decoded_bbox
        self.loss_cls_cfg = dict(loss_cls)
        self.loss_bbox_cfg = dict(loss_bbox)
        bbox_coder = bbox_coder or dict(type='DeltaXYWHBBoxCoder')
        self.bbox_coder = build_from_cfg(bbox_coder, BBOX_CODERS)
        anchor_generator = anchor_generator or dict(
            type='AnchorGenerator', scales=[8, 16, 32],
            ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64])
        self.anchor_generator = build_from_cfg(anchor_generator,
                                               ANCHOR_GENERATORS)
        self.num_anchors = self.anchor_generator.num_base_anchors[0]
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg
        self.loss_cls = build_from_cfg(self.loss_cls_cfg, LOSSES)
        self.loss_bbox = build_from_cfg(self.loss_bbox_cfg, LOSSES)
        if train_cfg is not None:
            self.assigner = build_from_cfg(train_cfg['assigner'],
                                           BBOX_ASSIGNERS)
            if self.sampling:
                self.sampler = build_from_cfg(train_cfg['sampler'],
                                              BBOX_SAMPLERS)
            else:
                self.sampler = build_from_cfg(dict(type='PseudoSampler'),
                                              BBOX_SAMPLERS)
        self._init_layers()

    def _init_layers(self):
        self.conv_cls = Conv2d(self.in_channels,
                               self.num_anchors * self.cls_out_channels, 1,
                               weight_init='normal', init_std=0.01)
        self.conv_reg = Conv2d(self.in_channels, self.num_anchors * 4, 1,
                               weight_init='normal', init_std=0.01)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'conv_cls': self.conv_cls.init(k1),
                'conv_reg': self.conv_reg.init(k2)}

    def forward_single(self, params, x):
        return (self.conv_cls(params['conv_cls'], x),
                self.conv_reg(params['conv_reg'], x))

    def __call__(self, params, feats):
        outs = [self.forward_single(params, f) for f in feats]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def _flatten_level(self, cls_score, bbox_pred):
        """(B,H,W,A*C),(B,H,W,A*4) -> (B,HWA,C),(B,HWA,4)."""
        b = cls_score.shape[0]
        c = self.cls_out_channels
        scores = cls_score.reshape(b, -1, c)
        preds = bbox_pred.reshape(b, -1, 4)
        return scores, preds

    def _topk_level(self, scores, preds, anchors, nms_pre):
        """Per-level static top-k by max foreground score
        (ref: anchor_head.py:521-534)."""
        hwa = scores.shape[1]
        if self.use_sigmoid_cls:
            probs = jax.nn.sigmoid(scores)
            max_scores = probs.max(axis=-1)
        else:
            probs = jax.nn.softmax(scores, axis=-1)
            max_scores = probs[..., :-1].max(axis=-1)
        if nms_pre <= 0 or hwa <= nms_pre:
            b = scores.shape[0]
            anc = jnp.broadcast_to(anchors[None], (b, hwa, 4))
            return probs, preds, anc
        _, idx = jax.lax.top_k(max_scores, nms_pre)
        probs = jnp.take_along_axis(probs, idx[..., None], axis=1)
        preds = jnp.take_along_axis(preds, idx[..., None], axis=1)
        anc = anchors[idx]
        return probs, preds, anc

    def _topk_level_nhwc(self, cls_score, bbox_pred, anchors, nms_pre):
        """Top-k selection straight from the NHWC head outputs: the only
        flattened tensor is the (B, HW, A) max-score map (1/C of the
        bytes _flatten_level touches), and only the nms_pre winners'
        C-wide score / 4-wide pred slices are gathered.

        Wall-clock note (round-5, RetinaNet bs8 on v5e): NO faster than
        the _flatten_level path composed — the 9.3 ms "flatten+topk"
        block in the per-block profile is prefix-differencing inflation
        (the prefix forces a materialization the fused full graph never
        pays; the real tail is top_k + NMS bound). Kept because it avoids
        a ~386 MB (B,HWA,C) f32 transient (live-memory headroom at larger
        batches) at equal speed, with identical selection order and
        arithmetic (idx = pos * A + a, f32 throughout); the one
        divergence is tie order among sigmoid-SATURATED candidates
        (logits > ~17 all score 1.0 in f32 — this path ranks their
        distinct logits, as arbitrary as the reference's index order).
        """
        b, h, w = cls_score.shape[:3]
        c = self.cls_out_channels
        a = cls_score.shape[-1] // c
        hwa = h * w * a
        if nms_pre <= 0 or hwa <= nms_pre or a == 0:
            return self._topk_level(*self._flatten_level(
                cls_score, bbox_pred), anchors, nms_pre)
        s4 = cls_score.reshape(b, h * w, a, c)
        p4 = bbox_pred.reshape(b, h * w, a, 4)
        if self.use_sigmoid_cls:
            # max over C on logits (sigmoid is monotone): equals the
            # flattened path's max(sigmoid(x))
            max_scores = jax.nn.sigmoid(s4.max(axis=-1))
        else:
            max_scores = jax.nn.softmax(s4, axis=-1)[..., :-1].max(axis=-1)
        _, idx = jax.lax.top_k(max_scores.reshape(b, hwa), nms_pre)
        pos, ai = idx // a, idx % a
        binds = jnp.arange(b)[:, None]
        s_sel = s4[binds, pos, ai]                   # (B, K, C) slice gather
        preds = p4[binds, pos, ai]                   # (B, K, 4)
        if self.use_sigmoid_cls:
            probs = jax.nn.sigmoid(s_sel)
        else:
            probs = jax.nn.softmax(s_sel, axis=-1)
        return probs, preds, anchors[idx]

    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   cfg=None, rescale=False):
        """Batched static decode + NMS (ref: anchor_head.py:420-553).

        Args:
            cls_scores / bbox_preds: per-level NHWC head outputs.
            img_shapes: (B, 2) dynamic (h, w) of resized (unpadded) images.
            scale_factors: (B, 4) resize factors.
        Returns:
            dets (B, max_per_img, 5), labels (B, max_per_img),
            valid (B, max_per_img).
        """
        cfg = self.test_cfg if cfg is None else cfg
        # force_fp32 boundary: detection math runs fp32 even under bf16
        # compute (ref: @force_fp32 on get_bboxes, anchor_head.py:419)
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)

        probs_l, preds_l, anchors_l = [], [], []
        for cls_score, bbox_pred, anchors in zip(cls_scores, bbox_preds,
                                                 mlvl_anchors):
            probs, preds, anc = self._topk_level_nhwc(
                cls_score, bbox_pred, jnp.asarray(anchors), nms_pre)
            probs_l.append(probs)
            preds_l.append(preds)
            anchors_l.append(anc)
        return self._bboxes_tail(jnp.concatenate(probs_l, axis=1),
                                 jnp.concatenate(preds_l, axis=1),
                                 jnp.concatenate(anchors_l, axis=1),
                                 img_shapes, scale_factors, cfg, rescale)

    def _bboxes_tail(self, probs, preds, anchors, img_shapes, scale_factors,
                     cfg, rescale):
        """Shared decode + rescale + multiclass-NMS tail over concatenated
        per-level candidates (probs (B,N,co), preds (B,N,4), anchors
        (B,N,4))."""

        def _decode_one(anc, prd, shape):
            return self.bbox_coder.decode(anc, prd, max_shape=shape)

        bboxes = jax.vmap(_decode_one)(anchors, preds, img_shapes)
        if rescale:
            bboxes = bboxes / scale_factors[:, None, :4]
        if self.use_sigmoid_cls:
            padding = jnp.zeros(probs.shape[:-1] + (1,), probs.dtype)
            probs = jnp.concatenate([probs, padding], axis=-1)

        nms_cfg = dict(cfg['nms'])
        max_per_img = cfg['max_per_img']
        score_thr = cfg['score_thr']
        pre_cap = cfg.get('nms_cap', 2000)

        def _nms_one(bb, ss):
            return multiclass_nms(bb, ss, score_thr, nms_cfg,
                                  max_num=max_per_img, pre_nms_cap=pre_cap)

        dets, labels, valid = jax.vmap(_nms_one)(bboxes, probs)
        return dets, labels, valid

    # ------------------------------------------------------------------
    # channel-major inference (TPU layout optimization)
    # ------------------------------------------------------------------
    # Any NHWC head output whose minor dim is a few channels (A*4 = 36 for
    # the reg branch) is lane-padded to 128; flattening it to candidate rows
    # is an untile copy at up to 42x bandwidth waste (see CLAUDE.md, the
    # round-3 RPN fix). The feats-direct path below computes the FINAL
    # cls/reg convs with NCHW (channel-major) output so the minor dim stays
    # H*W, runs per-level top-k on (A, HW)-shaped max-scores, and gathers
    # only the kept candidates. Numerically it differs from get_bboxes only
    # in candidate order within exact score ties (per-level order is
    # (anchor, position) instead of the reference's (position, anchor)).

    #: subclasses whose forward_single is exactly
    #: ``finals(forward_features(x))`` opt in (RetinaHead, SSDHead, ...)
    cm_finals = False

    def forward_features(self, params, x, lvl):
        """Per-level features feeding the final cls/reg convs.

        Returns (cls_feat, reg_feat); returning the SAME object for both
        lets the channel-major path fuse the two finals into one conv.
        """
        return x, x

    def final_params(self, params, lvl):
        """Param dicts (weight/bias) of the final cls and reg convs."""
        return params['conv_cls'], params['conv_reg']

    @staticmethod
    def _conv_cm(x, w, bias):
        """KxK same-padding conv with channel-major output: (B, Cout, HW)."""
        kh, kw = w.shape[0], w.shape[1]
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=('NHWC', 'HWIO', 'NCHW'))
        out = out + bias.astype(out.dtype)[None, :, None, None]
        b, c, h, wd = out.shape
        return out.reshape(b, c, h * wd)

    def _finals_cm(self, cls_feat, reg_feat, pc, pr):
        """Channel-major final convs -> (B, A*co, HW), (B, A*4, HW) fp32.

        When both finals read one tensor they run as ONE conv with stacked
        output channels (XLA does not fuse sibling convs); the row split
        afterwards is a cheap second-minor slice.
        """
        if cls_feat is reg_feat:
            w = jnp.concatenate([pc['weight'], pr['weight']], axis=-1)
            b = jnp.concatenate([pc['bias'], pr['bias']])
            out = self._conv_cm(cls_feat, w, b)
            n_cls = pc['bias'].shape[0]
            cls_t, reg_t = out[:, :n_cls], out[:, n_cls:]
        else:
            cls_t = self._conv_cm(cls_feat, pc['weight'], pc['bias'])
            reg_t = self._conv_cm(reg_feat, pr['weight'], pr['bias'])
        # force_fp32 boundary (ref: @force_fp32 on get_bboxes)
        return cls_t.astype(jnp.float32), reg_t.astype(jnp.float32)

    def get_bboxes_feats(self, params, feats, img_shapes, scale_factors,
                         cfg=None, rescale=False):
        """Feature-direct batched inference: finals + decode + NMS, with the
        finals computed channel-major. Same contract as ``get_bboxes``."""
        cfg = self.test_cfg if cfg is None else cfg
        featmap_sizes = [(f.shape[1], f.shape[2]) for f in feats]
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        nms_pre = cfg.get('nms_pre', -1)
        co = self.cls_out_channels
        probs_l, preds_l, anchors_l = [], [], []
        for lvl, (x, anchors) in enumerate(zip(feats, mlvl_anchors)):
            cls_feat, reg_feat = self.forward_features(params, x, lvl)
            pc, pr = self.final_params(params, lvl)
            num_a = pc['bias'].shape[0] // co  # per-level (SSD varies)
            cls_t, reg_t = self._finals_cm(cls_feat, reg_feat, pc, pr)
            # force_fp32 boundary (ref: @force_fp32 on get_bboxes,
            # anchor_head.py:419) — the NHWC path casts here too. Beyond
            # parity, this is ALSO the fix for the XLA TPU kernel-fault:
            # the round-5 bisect (tools/bisect_kernel_fault.py) shrank the
            # worker hard-fault to {resnet frontend + bf16 + the post-topk
            # vmapped gather t[ai,:,xi] + bs8 + >=4 levels + >=2 towers};
            # f32 at the same point compiles and runs clean.
            cls_t = cls_t.astype(jnp.float32)
            reg_t = reg_t.astype(jnp.float32)
            b, hw = cls_t.shape[0], cls_t.shape[-1]
            cls_t = cls_t.reshape(b, num_a, co, hw)
            reg_t = reg_t.reshape(b, num_a, 4, hw)
            # anchor-major candidate order; trace-time constant fold
            anchors = jnp.asarray(anchors).reshape(hw, num_a, 4) \
                .transpose(1, 0, 2).reshape(num_a * hw, 4)
            if self.use_sigmoid_cls:
                probs = jax.nn.sigmoid(cls_t)
                max_sc = probs.max(axis=2)              # (B, A, HW)
            else:
                probs = jax.nn.softmax(cls_t, axis=2)
                max_sc = probs[:, :, :-1].max(axis=2)
            hwa = num_a * hw
            if nms_pre > 0 and hwa > nms_pre:
                _, idx = jax.lax.top_k(max_sc.reshape(b, hwa), nms_pre)
                a_idx, x_idx = idx // hw, idx % hw

                def _gather(t, ai, xi):                 # (A,C,HW) -> (P,C)
                    return t[ai, :, xi]

                probs_g = jax.vmap(_gather)(probs, a_idx, x_idx)
                preds_g = jax.vmap(_gather)(reg_t, a_idx, x_idx)
                anc = anchors[idx]
            else:
                probs_g = probs.transpose(0, 1, 3, 2).reshape(b, hwa, co)
                preds_g = reg_t.transpose(0, 1, 3, 2).reshape(b, hwa, 4)
                anc = jnp.broadcast_to(anchors[None], (b, hwa, 4))
            probs_l.append(probs_g)
            preds_l.append(preds_g)
            anchors_l.append(anc)
        return self._bboxes_tail(jnp.concatenate(probs_l, axis=1),
                                 jnp.concatenate(preds_l, axis=1),
                                 jnp.concatenate(anchors_l, axis=1),
                                 img_shapes, scale_factors, cfg, rescale)

    # ------------------------------------------------------------------
    # training (ref: anchor_head.py:147-417)
    # ------------------------------------------------------------------

    def _targets_single(self, key, anchors, valid_flags, gt_bboxes, gt_valid,
                        gt_labels, img_shape):
        """Per-image anchor targets (ref: _get_targets_single,
        anchor_head.py:147-243), mask-based.

        Returns labels (N,), label_weights (N,), bbox_targets (N,4),
        bbox_weights (N,4), num_pos, num_neg.
        """
        cfg = self.train_cfg
        inside = anchor_inside_flags(anchors, valid_flags, img_shape,
                                     cfg.get('allowed_border', 0))
        assign = self.assigner.assign(
            anchors, gt_bboxes, gt_valid,
            None if self.sampling else gt_labels, box_valid=inside)
        assigned = assign['assigned_gt_inds']
        sample = self.sampler.sample(key, assigned)

        n = anchors.shape[0]
        labels = jnp.full((n,), self.background_label, jnp.int32)
        label_weights = jnp.zeros((n,), jnp.float32)
        bbox_targets = jnp.zeros((n, 4), jnp.float32)
        bbox_weights = jnp.zeros((n, 4), jnp.float32)

        safe_gt = jnp.clip(assigned - 1, 0, gt_bboxes.shape[0] - 1)
        matched_gt = take_rows(gt_bboxes, safe_gt)
        if not self.reg_decoded_bbox:
            all_targets = self.bbox_coder.encode(anchors, matched_gt)
        else:
            all_targets = matched_gt
        if gt_labels is None:
            all_labels = jnp.ones((n,), jnp.int32)  # RPN FG label is 1
        else:
            all_labels = take_rows(gt_labels.astype(jnp.int32), safe_gt)

        if self.sampling:
            inds, is_pos, svalid = (sample['inds'], sample['is_pos'],
                                    sample['valid'])
            pos_sel = jnp.zeros((n,), bool).at[inds].max(is_pos & svalid)
            neg_sel = jnp.zeros((n,), bool).at[inds].max(
                (~is_pos) & svalid)
        else:
            pos_sel = assigned > 0
            neg_sel = assigned == 0
        pos_w = cfg.get('pos_weight', -1)
        pos_w = 1.0 if pos_w <= 0 else pos_w
        labels = jnp.where(pos_sel, all_labels, labels)
        label_weights = jnp.where(pos_sel, pos_w, label_weights)
        label_weights = jnp.where(neg_sel, 1.0, label_weights)
        bbox_targets = jnp.where(pos_sel[:, None], all_targets, bbox_targets)
        bbox_weights = jnp.where(pos_sel[:, None], 1.0, bbox_weights)
        # 0-based assigned gt index at positives, -1 elsewhere (used by PISA)
        pos_gt_inds = jnp.where(pos_sel, safe_gt, -1).astype(jnp.int32)
        return (labels, label_weights, bbox_targets, bbox_weights,
                pos_sel.sum(), neg_sel.sum(), pos_gt_inds)

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
             img_shapes, key):
        """Batched loss over concatenated levels (ref: anchor_head.py:368-417;
        computing over the concatenation equals the reference's per-level
        multi_apply sum because the avg_factor is global).

        Args:
            cls_scores/bbox_preds: per-level NHWC outputs.
            gt_bboxes: (B, G, 4) padded; gt_valid: (B, G); gt_labels: (B, G)
                or None (RPN).
            img_shapes: (B, 2).
        """
        # force_fp32 boundary (ref: @force_fp32 on loss, anchor_head.py:367)
        cls_scores = [s.astype(jnp.float32) for s in cls_scores]
        bbox_preds = [p.astype(jnp.float32) for p in bbox_preds]
        b = cls_scores[0].shape[0]
        featmap_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
        anchors, flags = self._flat_anchor_table(featmap_sizes)
        cls_flat = jnp.concatenate(
            [s.reshape(b, -1, self.cls_out_channels) for s in cls_scores],
            axis=1)
        box_flat = jnp.concatenate(
            [p.reshape(b, -1, 4) for p in bbox_preds], axis=1)
        return self._loss_from_flat(anchors, flags, cls_flat, box_flat,
                                    gt_bboxes, gt_valid, gt_labels,
                                    img_shapes, key)

    def _flat_anchor_table(self, featmap_sizes, anchor_major=False):
        """Concatenated anchor table + pad-shape valid flags (trace-time
        numpy constants). ``anchor_major=True`` reorders each level from
        the reference's (position, anchor) to (anchor, position) candidate
        order — the order channel-major head outputs flatten to."""
        mlvl_anchors = self.anchor_generator.grid_anchors(featmap_sizes)
        pad_shape = (featmap_sizes[0][0] * self.anchor_generator.strides[0][0],
                     featmap_sizes[0][1] * self.anchor_generator.strides[0][1])
        mlvl_flags = self.anchor_generator.valid_flags(featmap_sizes,
                                                       pad_shape)
        if anchor_major:
            num_a = self.num_anchors
            mlvl_anchors = [
                a.reshape(-1, num_a, 4).transpose(1, 0, 2).reshape(-1, 4)
                for a in mlvl_anchors]
            mlvl_flags = [
                np.asarray(f).reshape(-1, num_a).T.reshape(-1)
                for f in mlvl_flags]
        anchors = jnp.asarray(np.concatenate(mlvl_anchors, axis=0))
        flags = jnp.asarray(np.concatenate(mlvl_flags))
        return anchors, flags

    def _loss_from_flat(self, anchors, flags, cls_flat, box_flat, gt_bboxes,
                        gt_valid, gt_labels, img_shapes, key):
        """Loss tail over concatenated flat outputs: per-image target
        assignment + cls/bbox losses. cls_flat (B, N, co), box_flat
        (B, N, 4) must be in the same candidate order as ``anchors``."""
        b = cls_flat.shape[0]
        keys = jax.random.split(key, b)
        if gt_labels is None:
            def tgt(k, gb, gv, shape):
                return self._targets_single(k, anchors, flags, gb, gv, None,
                                            shape)
            out = jax.vmap(tgt)(keys, gt_bboxes, gt_valid, img_shapes)
        else:
            def tgt(k, gb, gv, gl, shape):
                return self._targets_single(k, anchors, flags, gb, gv, gl,
                                            shape)
            out = jax.vmap(tgt)(keys, gt_bboxes, gt_valid, gt_labels,
                                img_shapes)
        labels, label_weights, bbox_targets, bbox_weights, npos, nneg, _ = out
        num_total_pos = jnp.maximum(npos, 1).sum()
        num_total_neg = jnp.maximum(nneg, 1).sum()
        num_total_samples = (num_total_pos + num_total_neg if self.sampling
                             else num_total_pos).astype(jnp.float32)

        cls_flat = cls_flat.reshape(-1, self.cls_out_channels)
        box_flat = box_flat.reshape(-1, 4)
        labels = labels.reshape(-1)
        label_weights = label_weights.reshape(-1)
        bbox_targets = bbox_targets.reshape(-1, 4)
        bbox_weights = bbox_weights.reshape(-1, 4)

        if self.use_sigmoid_cls and self.cls_out_channels == 1:
            # RPN binary case: labels 0/1 against single-logit predictions
            loss_cls = self.loss_cls(cls_flat[:, 0], labels.astype(jnp.float32),
                                     label_weights,
                                     avg_factor=num_total_samples)
        else:
            loss_cls = self.loss_cls(cls_flat, labels, label_weights,
                                     avg_factor=num_total_samples)
        if self.reg_decoded_bbox:
            box_flat = self.bbox_coder.decode(
                jnp.tile(anchors, (b, 1)), box_flat)
        loss_bbox = self.loss_bbox(box_flat, bbox_targets, bbox_weights,
                                   avg_factor=num_total_samples)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

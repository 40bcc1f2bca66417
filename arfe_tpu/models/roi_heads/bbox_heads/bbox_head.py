"""BBox heads for two-stage detectors.

TPU-native counterpart of ref:
mmdet/models/roi_heads/bbox_heads/bbox_head.py:14-323 (BBoxHead) and
convfc_bbox_head.py (ConvFCBBoxHead / Shared2FCBBoxHead /
Shared4Conv1FCBBoxHead). Param naming mirrors the reference state_dict:
``fc_cls``, ``fc_reg``, ``shared_convs.{i}.conv``, ``shared_fcs.{i}``, etc.

``get_bboxes`` is batched/static: inputs carry a proposal validity mask and
the NMS has fixed capacity (ref: bbox_head.py:206-242 semantics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....core.post.bbox_nms import multiclass_nms
from ....registry import BBOX_CODERS, HEADS, LOSSES, build_from_cfg
from ...layers import ConvModule, Linear, Module, avg_pool2d
from ...losses.accuracy import accuracy


def _flatten_nchw(x):
    """Flatten NHWC roi features in torch's (C, H, W) order so FC weights
    convert 1:1 from torch state_dicts (torch flattens NCHW)."""
    if x.ndim == 4:
        return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    return x.reshape(x.shape[0], -1)


@HEADS.register_module()
class BBoxHead(Module):
    """Simplest RoI head: optional avg pool + cls fc + reg fc."""

    def __init__(self, with_avg_pool=False, with_cls=True, with_reg=True,
                 roi_feat_size=7, in_channels=256, num_classes=80,
                 bbox_coder=None, reg_class_agnostic=False, loss_cls=None,
                 loss_bbox=None, fc_out_channels=None, **kwargs):
        self.with_avg_pool = with_avg_pool
        self.with_cls = with_cls
        self.with_reg = with_reg
        self.roi_feat_size = roi_feat_size if isinstance(roi_feat_size, tuple)\
            else (roi_feat_size, roi_feat_size)
        self.roi_feat_area = self.roi_feat_size[0] * self.roi_feat_size[1]
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.reg_class_agnostic = reg_class_agnostic
        bbox_coder = bbox_coder or dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2])
        self.bbox_coder = build_from_cfg(bbox_coder, BBOX_CODERS)
        self.loss_cls_cfg = dict(loss_cls or dict(
            type='CrossEntropyLoss', use_sigmoid=False, loss_weight=1.0))
        self.loss_bbox_cfg = dict(loss_bbox or dict(
            type='SmoothL1Loss', beta=1.0, loss_weight=1.0))
        self.custom_cfg = kwargs
        self.loss_cls = build_from_cfg(self.loss_cls_cfg, LOSSES)
        self.loss_bbox = build_from_cfg(self.loss_bbox_cfg, LOSSES)
        self._init_layers()

    def _head_in_channels(self):
        c = self.in_channels
        if not self.with_avg_pool:
            c *= self.roi_feat_area
        return c

    def _init_layers(self):
        c = self._head_in_channels()
        if self.with_cls:
            self.fc_cls = Linear(c, self.num_classes + 1,
                                 weight_init='normal', init_std=0.01)
        if self.with_reg:
            out = 4 if self.reg_class_agnostic else 4 * self.num_classes
            self.fc_reg = Linear(c, out, weight_init='normal',
                                 init_std=0.001)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {}
        if self.with_cls:
            p['fc_cls'] = self.fc_cls.init(k1)
        if self.with_reg:
            p['fc_reg'] = self.fc_reg.init(k2)
        return p

    def __call__(self, params, x):
        """x: (R, oh, ow, C) roi features -> (cls_score, bbox_pred)."""
        if self.with_avg_pool:
            x = x.mean(axis=(1, 2))
        else:
            x = _flatten_nchw(x)
        cls_score = self.fc_cls(params['fc_cls'], x) if self.with_cls \
            else None
        bbox_pred = self.fc_reg(params['fc_reg'], x) if self.with_reg \
            else None
        return cls_score, bbox_pred

    # ------------------------------------------------------------------
    def get_bboxes(self, rois, cls_score, bbox_pred, img_shape, scale_factor,
                   rescale=False, cfg=None, valid_mask=None):
        """Decode one image's detections (ref: bbox_head.py:206-242).

        Args:
            rois: (P, 4) proposal boxes (no batch col).
            cls_score: (P, num_classes+1); bbox_pred (P, 4k) or None.
            img_shape: (2,) dynamic (h, w); scale_factor (4,).
            valid_mask: (P,) proposal validity.
        """
        # force_fp32 boundary (ref: @force_fp32 on get_bboxes)
        if cls_score is not None:
            cls_score = cls_score.astype(jnp.float32)
        if bbox_pred is not None:
            bbox_pred = bbox_pred.astype(jnp.float32)
        rois = rois.astype(jnp.float32)
        scores = jax.nn.softmax(cls_score, axis=-1) \
            if cls_score is not None else None
        if bbox_pred is not None:
            bboxes = self.bbox_coder.decode(rois, bbox_pred,
                                            max_shape=img_shape)
        else:
            bboxes = jnp.tile(rois, (1, 1))
        if rescale:
            k = bboxes.shape[-1] // 4
            bboxes = bboxes / jnp.tile(scale_factor[:4], k)
        return multiclass_nms(
            bboxes, scores, cfg['score_thr'], cfg['nms'], cfg['max_per_img'],
            pre_nms_cap=cfg.get('nms_cap', 2000), valid_mask=valid_mask)

    def get_targets(self, sampled_boxes, sampled_gt_boxes, sampled_labels,
                    is_pos, valid, pos_weight=-1):
        """Targets for one image's sampled rois (ref: bbox_head.py:133-157 /
        bbox_target in core).

        Args:
            sampled_boxes: (S, 4) sampled proposal boxes.
            sampled_gt_boxes: (S, 4) matched gt box per sample (pos only
                meaningful).
            sampled_labels: (S,) matched gt label per sample.
            is_pos / valid: (S,) masks from the sampler.
        Returns:
            labels, label_weights, bbox_targets, bbox_weights
        """
        s = sampled_boxes.shape[0]
        labels = jnp.where(is_pos, sampled_labels,
                           jnp.full((s,), self.num_classes, jnp.int32))
        pw = 1.0 if pos_weight <= 0 else pos_weight
        label_weights = jnp.where(valid, jnp.where(is_pos, pw, 1.0), 0.0)
        targets = self.bbox_coder.encode(sampled_boxes, sampled_gt_boxes)
        bbox_targets = jnp.where(is_pos[:, None], targets, 0.0)
        bbox_weights = jnp.broadcast_to(
            is_pos[:, None], (s, 4)).astype(jnp.float32)
        return labels, label_weights, bbox_targets, bbox_weights

    def loss(self, cls_score, bbox_pred, labels, label_weights, bbox_targets,
             bbox_weights, **extra):
        """(ref: bbox_head.py:159-204). All inputs flattened over batch."""
        if cls_score is not None:
            cls_score = cls_score.astype(jnp.float32)
        if bbox_pred is not None:
            bbox_pred = bbox_pred.astype(jnp.float32)
        losses = {}
        avg_factor = jnp.maximum(label_weights.sum(), 1.0)
        if cls_score is not None:
            losses['loss_cls'] = self.loss_cls(
                cls_score, labels, label_weights, avg_factor=avg_factor)
            losses['acc'] = accuracy(cls_score, labels,
                                     valid_mask=label_weights > 0)
        if bbox_pred is not None:
            if self.reg_class_agnostic:
                pred = bbox_pred
            else:
                safe = jnp.clip(labels, 0, self.num_classes - 1)
                inds = jnp.stack([4 * safe, 4 * safe + 1, 4 * safe + 2,
                                  4 * safe + 3], axis=-1)
                pred = jnp.take_along_axis(bbox_pred, inds, axis=1)
            # ref uses avg_factor = bbox_targets.size(0) (all sampled rois)
            losses['loss_bbox'] = self.loss_bbox(
                pred, bbox_targets, bbox_weights,
                avg_factor=float(bbox_targets.shape[0]))
        return losses

    def decoded_boxes_for_refine(self, rois, cls_score, bbox_pred, img_shape):
        """Regressed boxes of the predicted class — cascade refinement
        (ref: bbox_head.py:245-323 refine_bboxes/regress_by_class)."""
        if not self.reg_class_agnostic:
            labels = jnp.argmax(cls_score[:, :-1], axis=-1)
            inds = jnp.stack([4 * labels, 4 * labels + 1, 4 * labels + 2,
                              4 * labels + 3], axis=-1)
            bbox_pred = jnp.take_along_axis(bbox_pred, inds, axis=1)
        return self.bbox_coder.decode(rois, bbox_pred, max_shape=img_shape)


@HEADS.register_module()
class ConvFCBBoxHead(BBoxHead):
    """shared convs/fcs -> separate cls/reg branches
    (ref: convfc_bbox_head.py:10-205)."""

    def __init__(self, num_shared_convs=0, num_shared_fcs=0, num_cls_convs=0,
                 num_cls_fcs=0, num_reg_convs=0, num_reg_fcs=0,
                 conv_out_channels=256, fc_out_channels=1024, conv_cfg=None,
                 norm_cfg=None, *args, **kwargs):
        self.num_shared_convs = num_shared_convs
        self.num_shared_fcs = num_shared_fcs
        self.num_cls_convs = num_cls_convs
        self.num_cls_fcs = num_cls_fcs
        self.num_reg_convs = num_reg_convs
        self.num_reg_fcs = num_reg_fcs
        self.conv_out_channels = conv_out_channels
        self.fc_out_channels = fc_out_channels
        self.norm_cfg = norm_cfg
        kwargs.pop('fc_out_channels', None)
        super().__init__(*args, **kwargs)

    def _branch(self, num_convs, num_fcs, in_channels, is_shared=False):
        convs, fcs = [], []
        last = in_channels
        for _ in range(num_convs):
            convs.append(ConvModule(last, self.conv_out_channels, 3,
                                    padding=1, norm_cfg=self.norm_cfg,
                                    act_cfg='relu', weight_init='xavier'))
            last = self.conv_out_channels
        if num_fcs > 0:
            if (is_shared or num_convs == 0) and not self.with_avg_pool:
                last = last * self.roi_feat_area
            for _ in range(num_fcs):
                fcs.append(Linear(last, self.fc_out_channels,
                                  weight_init='xavier'))
                last = self.fc_out_channels
        return convs, fcs, last

    def _init_layers(self):
        self.shared_convs, self.shared_fcs, last = self._branch(
            self.num_shared_convs, self.num_shared_fcs, self.in_channels,
            is_shared=True)
        self.shared_out = last
        self.cls_convs, self.cls_fcs, cls_last = self._branch(
            self.num_cls_convs, self.num_cls_fcs, last)
        self.reg_convs, self.reg_fcs, reg_last = self._branch(
            self.num_reg_convs, self.num_reg_fcs, last)
        if self.num_shared_fcs == 0 and not self.with_avg_pool:
            if self.num_cls_fcs == 0:
                cls_last *= self.roi_feat_area
            if self.num_reg_fcs == 0:
                reg_last *= self.roi_feat_area
        if self.with_cls:
            self.fc_cls = Linear(cls_last, self.num_classes + 1,
                                 weight_init='normal', init_std=0.01)
        if self.with_reg:
            out = 4 if self.reg_class_agnostic else 4 * self.num_classes
            self.fc_reg = Linear(reg_last, out, weight_init='normal',
                                 init_std=0.001)

    def init(self, key):
        keys = iter(jax.random.split(key, 32))
        p = {}
        for name, mods in (('shared_convs', self.shared_convs),
                           ('shared_fcs', self.shared_fcs),
                           ('cls_convs', self.cls_convs),
                           ('cls_fcs', self.cls_fcs),
                           ('reg_convs', self.reg_convs),
                           ('reg_fcs', self.reg_fcs)):
            if mods:
                p[name] = {str(i): m.init(next(keys))
                           for i, m in enumerate(mods)}
        if self.with_cls:
            p['fc_cls'] = self.fc_cls.init(next(keys))
        if self.with_reg:
            p['fc_reg'] = self.fc_reg.init(next(keys))
        return p

    def _forward_shared(self, params, x):
        for i, m in enumerate(self.shared_convs):
            x = m(params['shared_convs'][str(i)], x)
        if self.num_shared_fcs > 0:
            x = _flatten_nchw(x)
            for i, m in enumerate(self.shared_fcs):
                x = jax.nn.relu(m(params['shared_fcs'][str(i)], x))
        return x

    def _forward_branch(self, params, x, convs, fcs, conv_key, fc_key):
        for i, m in enumerate(convs):
            x = m(params[conv_key][str(i)], x)
        if x.ndim > 2:
            if self.with_avg_pool:
                x = x.mean(axis=(1, 2))
            else:
                x = _flatten_nchw(x)
        for i, m in enumerate(fcs):
            x = jax.nn.relu(m(params[fc_key][str(i)], x))
        return x

    def __call__(self, params, x):
        x = self._forward_shared(params, x)
        x_cls = self._forward_branch(params, x, self.cls_convs, self.cls_fcs,
                                     'cls_convs', 'cls_fcs')
        x_reg = self._forward_branch(params, x, self.reg_convs, self.reg_fcs,
                                     'reg_convs', 'reg_fcs')
        cls_score = self.fc_cls(params['fc_cls'], x_cls) if self.with_cls \
            else None
        bbox_pred = self.fc_reg(params['fc_reg'], x_reg) if self.with_reg \
            else None
        return cls_score, bbox_pred


@HEADS.register_module()
class Shared2FCBBoxHead(ConvFCBBoxHead):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(num_shared_convs=0, num_shared_fcs=2,
                         num_cls_convs=0, num_cls_fcs=0, num_reg_convs=0,
                         num_reg_fcs=0, fc_out_channels=fc_out_channels,
                         *args, **kwargs)


@HEADS.register_module()
class Shared4Conv1FCBBoxHead(ConvFCBBoxHead):
    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(num_shared_convs=4, num_shared_fcs=1,
                         num_cls_convs=0, num_cls_fcs=0, num_reg_convs=0,
                         num_reg_fcs=0, fc_out_channels=fc_out_channels,
                         *args, **kwargs)

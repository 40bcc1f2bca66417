"""Guided-anchor RetinaNet head (ref: mmdet/models/dense_heads/
ga_retina_head.py:9-108).

Four stacked convs per branch; the loc/shape predictions come off the
cls/reg towers respectively, and separate FeatureAdaption DCNs condition
each tower on the predicted shapes. The reference's MaskedConv2d
inference-speed trick is intentionally dense (see guided_anchor_head).
"""
from __future__ import annotations

import math

import jax

from ...registry import HEADS
from ..layers import Conv2d, ConvModule
from .guided_anchor_head import FeatureAdaption, GuidedAnchorHead


@HEADS.register_module()
class GARetinaHead(GuidedAnchorHead):
    def __init__(self, num_classes, in_channels, stacked_convs=4,
                 conv_cfg=None, norm_cfg=None, **kwargs):
        self.stacked_convs = stacked_convs
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg
        super().__init__(num_classes, in_channels, **kwargs)

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
        self.conv_loc = Conv2d(self.feat_channels, 1, 1,
                               weight_init='normal', init_std=0.01,
                               bias_value=bias_cls)
        self.conv_shape = Conv2d(self.feat_channels, self.num_anchors * 2, 1,
                                 weight_init='normal', init_std=0.01)
        self.feature_adaption_cls = FeatureAdaption(
            self.feat_channels, self.feat_channels, kernel_size=3,
            deform_groups=self.deformable_groups)
        self.feature_adaption_reg = FeatureAdaption(
            self.feat_channels, self.feat_channels, kernel_size=3,
            deform_groups=self.deformable_groups)
        self.retina_cls = Conv2d(
            self.feat_channels, self.num_anchors * self.cls_out_channels, 3,
            padding=1, weight_init='normal', init_std=0.01,
            bias_value=bias_cls)
        self.retina_reg = Conv2d(self.feat_channels, self.num_anchors * 4,
                                 3, padding=1, weight_init='normal',
                                 init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs + 6)
        it = iter(keys)
        return {
            'cls_convs': {str(i): m.init(next(it))
                          for i, m in enumerate(self.cls_convs)},
            'reg_convs': {str(i): m.init(next(it))
                          for i, m in enumerate(self.reg_convs)},
            'conv_loc': self.conv_loc.init(next(it)),
            'conv_shape': self.conv_shape.init(next(it)),
            'feature_adaption_cls': self.feature_adaption_cls.init(next(it)),
            'feature_adaption_reg': self.feature_adaption_reg.init(next(it)),
            'retina_cls': self.retina_cls.init(next(it)),
            'retina_reg': self.retina_reg.init(next(it)),
        }

    def forward_single(self, params, x):
        cls_feat = x
        reg_feat = x
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        for i, m in enumerate(self.reg_convs):
            reg_feat = m(params['reg_convs'][str(i)], reg_feat)
        loc_pred = self.conv_loc(params['conv_loc'], cls_feat)
        shape_pred = self.conv_shape(params['conv_shape'], reg_feat)
        cls_feat = self.feature_adaption_cls(
            params['feature_adaption_cls'], cls_feat, shape_pred)
        reg_feat = self.feature_adaption_reg(
            params['feature_adaption_reg'], reg_feat, shape_pred)
        cls_score = self.retina_cls(params['retina_cls'], cls_feat)
        bbox_pred = self.retina_reg(params['retina_reg'], reg_feat)
        return cls_score, bbox_pred, shape_pred, loc_pred

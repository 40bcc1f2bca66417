"""RetinaNet head (ref: mmdet/models/dense_heads/retina_head.py:9-100).

Param tree mirrors reference naming: ``cls_convs.{i}.conv``,
``reg_convs.{i}.conv``, ``retina_cls``, ``retina_reg``.
"""
from __future__ import annotations

import math

import jax

from ...registry import HEADS
from ..layers import Conv2d, ConvModule
from .anchor_head import AnchorHead


@HEADS.register_module()
class RetinaHead(AnchorHead):
    def __init__(self, num_classes, in_channels, stacked_convs=4,
                 conv_cfg=None, norm_cfg=None, anchor_generator=None,
                 **kwargs):
        self.stacked_convs = stacked_convs
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg
        anchor_generator = anchor_generator or dict(
            type='AnchorGenerator', octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128])
        super().__init__(num_classes, in_channels,
                         anchor_generator=anchor_generator, **kwargs)

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
        # cls bias init to focal prior prob 0.01
        # (ref: retina_head.py init_weights, bias_init_with_prob)
        prior_prob = 0.01
        bias_cls = -math.log((1 - prior_prob) / prior_prob)
        self.retina_cls = Conv2d(
            self.feat_channels, self.num_anchors * self.cls_out_channels, 3,
            padding=1, weight_init='normal', init_std=0.01,
            bias_value=bias_cls)
        self.retina_reg = Conv2d(self.feat_channels, self.num_anchors * 4, 3,
                                 padding=1, weight_init='normal',
                                 init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs + 2)
        return {
            'cls_convs': {str(i): m.init(keys[i])
                          for i, m in enumerate(self.cls_convs)},
            'reg_convs': {str(i): m.init(keys[self.stacked_convs + i])
                          for i, m in enumerate(self.reg_convs)},
            'retina_cls': self.retina_cls.init(keys[-2]),
            'retina_reg': self.retina_reg.init(keys[-1]),
        }

    cm_finals = True

    def forward_features(self, params, x, lvl=0):
        cls_feat = x
        reg_feat = x
        for i, m in enumerate(self.cls_convs):
            cls_feat = m(params['cls_convs'][str(i)], cls_feat)
        for i, m in enumerate(self.reg_convs):
            reg_feat = m(params['reg_convs'][str(i)], reg_feat)
        return cls_feat, reg_feat

    def final_params(self, params, lvl=0):
        return params['retina_cls'], params['retina_reg']

    def forward_single(self, params, x):
        cls_feat, reg_feat = self.forward_features(params, x)
        cls_score = self.retina_cls(params['retina_cls'], cls_feat)
        bbox_pred = self.retina_reg(params['retina_reg'], reg_feat)
        return cls_score, bbox_pred

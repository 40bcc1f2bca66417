"""Double-Head R-CNN bbox head (ref:
mmdet/models/roi_heads/bbox_heads/double_bbox_head.py:9-174).

Conv branch (BasicResBlock + Bottlenecks + avg-pool) regresses boxes; FC
branch classifies. Param names mirror the reference: ``res_block``,
``conv_branch.{i}``, ``fc_branch.{i}``, ``fc_cls``, ``fc_reg``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS
from ...backbones.resnet import Bottleneck
from ...layers import ConvModule, Linear, Module
from .bbox_head import BBoxHead


class BasicResBlock(Module):
    """(ref: double_bbox_head.py:9-68): 3x3 conv-bn-relu -> 1x1 conv-bn,
    plus a 1x1 conv-bn identity path, relu after the sum."""

    def __init__(self, in_channels, out_channels, norm_cfg=None):
        norm_cfg = norm_cfg or dict(type='BN')
        self.conv1 = ConvModule(in_channels, in_channels, 3, padding=1,
                                bias='auto', norm_cfg=norm_cfg,
                                act_cfg='relu')
        self.conv2 = ConvModule(in_channels, out_channels, 1, bias='auto',
                                norm_cfg=norm_cfg, act_cfg=None)
        self.conv_identity = ConvModule(in_channels, out_channels, 1,
                                        norm_cfg=norm_cfg, act_cfg=None)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {'conv1': self.conv1.init(k1), 'conv2': self.conv2.init(k2),
                'conv_identity': self.conv_identity.init(k3)}

    def __call__(self, params, x):
        out = self.conv2(params['conv2'], self.conv1(params['conv1'], x))
        identity = self.conv_identity(params['conv_identity'], x)
        return jax.nn.relu(out + identity)


@HEADS.register_module()
class DoubleConvFCBBoxHead(BBoxHead):
    def __init__(self, num_convs=0, num_fcs=0, conv_out_channels=1024,
                 fc_out_channels=1024, conv_cfg=None, norm_cfg=None,
                 **kwargs):
        kwargs.setdefault('with_avg_pool', True)
        assert num_convs > 0 and num_fcs > 0
        self.num_convs = num_convs
        self.num_fcs = num_fcs
        self.conv_out_channels = conv_out_channels
        self.fc_out_channels = fc_out_channels
        self.norm_cfg = norm_cfg or dict(type='BN')
        super().__init__(**kwargs)

    def _init_layers(self):
        self.res_block = BasicResBlock(self.in_channels,
                                       self.conv_out_channels,
                                       self.norm_cfg)
        self.conv_branch = [
            Bottleneck(self.conv_out_channels, self.conv_out_channels // 4)
            for _ in range(self.num_convs)
        ]
        self.fc_branch = [
            Linear(self.in_channels * self.roi_feat_area if i == 0
                   else self.fc_out_channels, self.fc_out_channels,
                   weight_init='xavier')
            for i in range(self.num_fcs)
        ]
        out_dim_reg = 4 if self.reg_class_agnostic else 4 * self.num_classes
        self.fc_reg = Linear(self.conv_out_channels, out_dim_reg,
                             weight_init='normal', init_std=0.001)
        self.fc_cls = Linear(self.fc_out_channels, self.num_classes + 1,
                             weight_init='normal', init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 3 + self.num_convs + self.num_fcs)
        return {
            'res_block': self.res_block.init(keys[0]),
            'conv_branch': {str(i): m.init(keys[1 + i])
                            for i, m in enumerate(self.conv_branch)},
            'fc_branch': {str(i): m.init(keys[1 + self.num_convs + i])
                          for i, m in enumerate(self.fc_branch)},
            'fc_reg': self.fc_reg.init(keys[-2]),
            'fc_cls': self.fc_cls.init(keys[-1]),
        }

    def __call__(self, params, x_cls, x_reg=None):
        """x_cls/x_reg: (R, oh, ow, C) roi features
        (ref: double_bbox_head.py:152-174)."""
        if x_reg is None:
            x_reg = x_cls
        x_conv = self.res_block(params['res_block'], x_reg)
        for i, m in enumerate(self.conv_branch):
            x_conv = m(params['conv_branch'][str(i)], x_conv)
        x_conv = x_conv.mean(axis=(1, 2))
        bbox_pred = self.fc_reg(params['fc_reg'], x_conv)

        from .bbox_head import _flatten_nchw
        x_fc = _flatten_nchw(x_cls)
        for i, m in enumerate(self.fc_branch):
            x_fc = jax.nn.relu(self.fc_branch[i](params['fc_branch'][str(i)],
                                                 x_fc))
        cls_score = self.fc_cls(params['fc_cls'], x_fc)
        return cls_score, bbox_pred

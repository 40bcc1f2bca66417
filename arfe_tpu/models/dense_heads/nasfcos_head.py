"""NAS-FCOS head (ref: mmdet/models/dense_heads/nasfcos_head.py:11-75).

FCOSHead with the searched branch structure
[DCNv2 3x3 (dg=2, bias), Conv 3x3, DCNv2 3x3, Conv 1x1], each followed by
the head's norm (GN) + ReLU.
"""
from __future__ import annotations

import jax

from ...ops.deform_conv import ModulatedDeformConv2d
from ...registry import HEADS
from ..layers import ConvModule, Module, build_norm
from .fcos_head import FCOSHead


class DCNConvModule(Module):
    """DCNv2 + norm + ReLU with mmcv ConvModule param naming
    (children ``conv``, ``bn``)."""

    def __init__(self, in_channels, out_channels, kernel_size, padding=0,
                 deform_groups=2, bias=True, norm_cfg=None):
        self.conv = ModulatedDeformConv2d(
            in_channels, out_channels, kernel_size, padding=padding,
            deform_groups=deform_groups, bias=bias)
        self.with_norm = norm_cfg is not None
        self.norm = build_norm(norm_cfg, out_channels)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        p = {'conv': self.conv.init(k1)}
        if self.with_norm:
            p['bn'] = self.norm.init(k2)
        return p

    def __call__(self, params, x):
        y = self.conv(params['conv'], x)
        if self.with_norm:
            y = self.norm(params['bn'], y)
        return jax.nn.relu(y)


@HEADS.register_module()
class NASFCOSHead(FCOSHead):
    def _init_layers(self):
        from ..layers import Conv2d
        import math
        self.cls_convs = []
        self.reg_convs = []
        arch = [dict(dcn=True, kernel_size=3, padding=1, bias=True),
                dict(dcn=False, kernel_size=3, padding=1),
                dict(dcn=True, kernel_size=3, padding=1, bias=True),
                dict(dcn=False, kernel_size=1, padding=0)]
        for branch in (self.cls_convs, self.reg_convs):
            for i, op in enumerate(arch):
                chn = self.in_channels if i == 0 else self.feat_channels
                if op['dcn']:
                    branch.append(DCNConvModule(
                        chn, self.feat_channels, op['kernel_size'],
                        padding=op['padding'], deform_groups=2,
                        bias=op['bias'], norm_cfg=self.norm_cfg))
                else:
                    branch.append(ConvModule(
                        chn, self.feat_channels, op['kernel_size'],
                        padding=op['padding'], norm_cfg=self.norm_cfg,
                        act_cfg='relu', weight_init='xavier'))
        self.stacked_convs = len(arch)
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.conv_cls = Conv2d(self.feat_channels, self.num_classes, 3,
                               padding=1, weight_init='normal',
                               init_std=0.01, bias_value=bias_cls)
        self.conv_reg = Conv2d(self.feat_channels, 4, 3, padding=1,
                               weight_init='normal', init_std=0.01)
        self.conv_centerness = Conv2d(self.feat_channels, 1, 3, padding=1,
                                      weight_init='normal', init_std=0.01)

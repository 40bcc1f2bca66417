"""FPN with configurable (CARAFE) upsampling in the top-down path
(ref: mmdet/models/necks/fpn_carafe.py:9-254).

Extra output levels come from stride-2 *lateral* convs chained on the last
lateral (the reference's unusual extra-level layout is reproduced).
Supported upsample types here: 'carafe', 'nearest', None (deconv /
pixel_shuffle are not used by the reference's configs).
"""
from __future__ import annotations

import jax

from ...ops.attention_ops import CARAFEPack
from ...registry import NECKS
from ..layers import ConvModule, Module, upsample2x_nearest


@NECKS.register_module()
class FPN_CARAFE(Module):
    def __init__(self, in_channels, out_channels, num_outs, start_level=0,
                 end_level=-1, norm_cfg=None, act_cfg=None,
                 order=('conv', 'norm', 'act'), upsample_cfg=None):
        upsample_cfg = dict(upsample_cfg or dict(
            type='carafe', up_kernel=5, up_group=1, encoder_kernel=3,
            encoder_dilation=1))
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        self.upsample = upsample_cfg.pop('type')
        assert self.upsample in ('carafe', 'nearest', None)
        self.upsample_cfg = upsample_cfg
        if end_level == -1:
            self.backbone_end_level = self.num_ins
        else:
            self.backbone_end_level = end_level
        self.start_level = start_level

        act = act_cfg if act_cfg is None else act_cfg.get('type', 'relu')
        self.lateral_convs = []
        self.fpn_convs = []
        self.upsample_modules = []
        for i in range(start_level, self.backbone_end_level):
            self.lateral_convs.append(ConvModule(
                in_channels[i], out_channels, 1, norm_cfg=norm_cfg,
                act_cfg=act, weight_init='xavier'))
            self.fpn_convs.append(ConvModule(
                out_channels, out_channels, 3, padding=1, norm_cfg=norm_cfg,
                act_cfg=act, weight_init='xavier'))
            if i != self.backbone_end_level - 1 and \
                    self.upsample == 'carafe':
                self.upsample_modules.append(CARAFEPack(
                    out_channels, 2, **self.upsample_cfg))

        extra_out = num_outs - self.backbone_end_level + start_level
        for i in range(extra_out):
            cin = (in_channels[self.backbone_end_level - 1] if i == 0
                   else out_channels)
            self.lateral_convs.append(ConvModule(
                cin, out_channels, 3, stride=2, padding=1,
                norm_cfg=norm_cfg, act_cfg=act, weight_init='xavier'))
            self.fpn_convs.append(ConvModule(
                out_channels, out_channels, 3, padding=1, norm_cfg=norm_cfg,
                act_cfg=act, weight_init='xavier'))
            if self.upsample == 'carafe':
                self.upsample_modules.append(CARAFEPack(
                    out_channels, 2, **self.upsample_cfg))

    def init(self, key):
        n = len(self.lateral_convs) + len(self.fpn_convs) \
            + len(self.upsample_modules)
        keys = jax.random.split(key, n)
        it = iter(keys)
        return {
            'lateral_convs': {str(i): m.init(next(it))
                              for i, m in enumerate(self.lateral_convs)},
            'fpn_convs': {str(i): m.init(next(it))
                          for i, m in enumerate(self.fpn_convs)},
            'upsample_modules': {
                str(i): m.init(next(it))
                for i, m in enumerate(self.upsample_modules)},
        }

    def __call__(self, params, inputs):
        laterals = []
        n_back = self.backbone_end_level - self.start_level
        for i, m in enumerate(self.lateral_convs):
            if i <= n_back:
                x = inputs[min(i + self.start_level, len(inputs) - 1)]
            else:
                x = laterals[-1]
            laterals.append(m(params['lateral_convs'][str(i)], x))
        for i in range(len(laterals) - 1, 0, -1):
            if self.upsample == 'carafe':
                up = self.upsample_modules[i - 1](
                    params['upsample_modules'][str(i - 1)], laterals[i])
            elif self.upsample == 'nearest':
                up = upsample2x_nearest(laterals[i])
            else:
                up = laterals[i]
            # slice-as add (sizes can mismatch by odd-dim upsampling)
            h = min(laterals[i - 1].shape[1], up.shape[1])
            w = min(laterals[i - 1].shape[2], up.shape[2])
            laterals[i - 1] = laterals[i - 1][:, :h, :w] + up[:, :h, :w]
        return tuple(self.fpn_convs[i](params['fpn_convs'][str(i)],
                                       laterals[i])
                     for i in range(len(self.fpn_convs)))

"""RegNetX backbone (ref: mmdet/models/backbones/regnet.py:10-318).

Width schedule generated from (w0, wa, wm, depth), grouped bottlenecks with
expansion 1, 3x3/stride-2 stem and NO maxpool. Param names conv1/bn1 +
layer{i}.{j}.(conv1..3|bn1..3|downsample.0/1) match the torch state_dict.
"""
from __future__ import annotations

import jax
import numpy as np

from ...registry import BACKBONES
from ..layers import BatchNorm, Conv2d, Module
from .resnet import ResNet


class RegNetBottleneck(Module):
    """Bottleneck with expansion 1 and explicit grouped mid width
    (equivalent to the reference's ResNeXt Bottleneck with
    base_channels=stage_width, expansion=1)."""

    expansion = 1

    def __init__(self, inplanes, planes, width, groups, stride=1,
                 dilation=1, downsample=False, style='pytorch', dcn=None):
        if style == 'pytorch':
            conv1_stride, conv2_stride = 1, stride
        else:
            conv1_stride, conv2_stride = stride, 1
        self.conv1 = Conv2d(inplanes, width, 1, stride=conv1_stride,
                            bias=False, weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(width)
        if dcn is not None:
            from ...ops.deform_conv import DeformConv2d
            self.conv2 = DeformConv2d(
                width, width, 3, stride=conv2_stride, padding=dilation,
                dilation=dilation, groups=groups, bias=False,
                deform_groups=dcn.get('deform_groups', 1),
                modulated=dcn.get('type') == 'DCNv2'
                or dcn.get('modulated', False))
        else:
            self.conv2 = Conv2d(width, width, 3, stride=conv2_stride,
                                padding=dilation, dilation=dilation,
                                groups=groups, bias=False,
                                weight_init='kaiming_fan_out')
        self.bn2 = BatchNorm(width)
        self.conv3 = Conv2d(width, planes, 1, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn3 = BatchNorm(planes)
        self.has_downsample = downsample
        if downsample:
            self.ds_conv = Conv2d(inplanes, planes, 1, stride=stride,
                                  bias=False, weight_init='kaiming_fan_out')
            self.ds_bn = BatchNorm(planes)

    def init(self, key):
        keys = jax.random.split(key, 4)
        p = {'conv1': self.conv1.init(keys[0]), 'bn1': self.bn1.init(keys[0]),
             'conv2': self.conv2.init(keys[1]), 'bn2': self.bn2.init(keys[1]),
             'conv3': self.conv3.init(keys[2]), 'bn3': self.bn3.init(keys[2])}
        if self.has_downsample:
            p['downsample'] = {'0': self.ds_conv.init(keys[3]),
                               '1': self.ds_bn.init(keys[3])}
        return p

    def __call__(self, params, x):
        identity = x
        out = jax.nn.relu(self.bn1(params['bn1'],
                                   self.conv1(params['conv1'], x)))
        out = jax.nn.relu(self.bn2(params['bn2'],
                                   self.conv2(params['conv2'], out)))
        out = self.bn3(params['bn3'], self.conv3(params['conv3'], out))
        if self.has_downsample:
            identity = self.ds_bn(params['downsample']['1'],
                                  self.ds_conv(params['downsample']['0'],
                                               x))
        return jax.nn.relu(out + identity)


@BACKBONES.register_module()
class RegNet(ResNet):
    arch_settings = {
        'regnetx_800mf':
        dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16, bot_mul=1.0),
        'regnetx_1.6gf':
        dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18, bot_mul=1.0),
        'regnetx_3.2gf':
        dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25, bot_mul=1.0),
        'regnetx_4.0gf':
        dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23, bot_mul=1.0),
        'regnetx_6.4gf':
        dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17, bot_mul=1.0),
        'regnetx_8.0gf':
        dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23, bot_mul=1.0),
        'regnetx_12gf':
        dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19, bot_mul=1.0),
    }

    def __init__(self, arch, in_channels=3, base_channels=32,
                 strides=(2, 2, 2, 2), dilations=(1, 1, 1, 1),
                 out_indices=(0, 1, 2, 3), style='pytorch',
                 frozen_stages=-1, norm_cfg=None, norm_eval=True,
                 dcn=None, stage_with_dcn=(False, False, False, False),
                 **kwargs):
        if isinstance(arch, str):
            arch = self.arch_settings[arch]
        widths, num_stages = self.generate_regnet(
            arch['w0'], arch['wa'], arch['wm'], arch['depth'])
        stage_widths, stage_blocks = self.get_stages_from_blocks(widths)
        group_widths = [arch['group_w']] * num_stages
        bot_muls = [arch['bot_mul']] * num_stages
        stage_widths, group_widths = self.adjust_width_group(
            stage_widths, bot_muls, group_widths)

        self.depth = sum(stage_blocks)
        self.num_stages = num_stages
        self.out_indices = tuple(out_indices)
        self.frozen_stages = frozen_stages
        self.deep_stem = False
        self.style = style
        self.block_cls = RegNetBottleneck
        self.stage_widths = stage_widths

        self.conv1 = Conv2d(in_channels, base_channels, 3, stride=2,
                            padding=1, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(base_channels)

        self.layers = []
        inplanes = base_channels
        self.out_channels = []
        for i in range(num_stages):
            width = int(round(stage_widths[i] * bot_muls[i]))
            groups = width // group_widths[i]
            stage_dcn = dcn if (dcn is not None
                                and stage_with_dcn[i]) else None
            blocks = []
            for j in range(stage_blocks[i]):
                s = strides[i] if j == 0 else 1
                need_ds = j == 0 and (s != 1
                                      or inplanes != stage_widths[i])
                blocks.append(RegNetBottleneck(
                    inplanes, stage_widths[i], width, groups, stride=s,
                    dilation=dilations[i], downsample=need_ds, style=style,
                    dcn=stage_dcn))
                inplanes = stage_widths[i]
            self.layers.append(blocks)
            self.out_channels.append(stage_widths[i])

    # -- width schedule (ref: regnet.py:215-305) --

    @staticmethod
    def generate_regnet(initial_width, width_slope, width_parameter, depth,
                        divisor=8):
        widths_cont = np.arange(depth) * width_slope + initial_width
        ks = np.round(
            np.log(widths_cont / initial_width) / np.log(width_parameter))
        widths = initial_width * np.power(width_parameter, ks)
        widths = np.round(np.divide(widths, divisor)) * divisor
        num_stages = len(np.unique(widths))
        return widths.astype(int).tolist(), num_stages

    @staticmethod
    def quantize_float(number, divisor):
        return int(round(number / divisor) * divisor)

    def adjust_width_group(self, widths, bottleneck_ratio, groups):
        bottleneck_width = [int(w * b)
                            for w, b in zip(widths, bottleneck_ratio)]
        groups = [min(g, w_bot)
                  for g, w_bot in zip(groups, bottleneck_width)]
        bottleneck_width = [self.quantize_float(w_bot, g)
                            for w_bot, g in zip(bottleneck_width, groups)]
        widths = [int(w_bot / b)
                  for w_bot, b in zip(bottleneck_width, bottleneck_ratio)]
        return widths, groups

    @staticmethod
    def get_stages_from_blocks(widths):
        width_diff = [w != wp
                      for w, wp in zip(widths + [0], [0] + widths)]
        stage_widths = [w for w, d in zip(widths, width_diff[:-1]) if d]
        stage_blocks = np.diff([
            depth for depth, diff in zip(range(len(width_diff)), width_diff)
            if diff]).tolist()
        return stage_widths, stage_blocks

    def __call__(self, params, x):
        params = self._maybe_freeze(params)
        x = jax.nn.relu(self.bn1(params['bn1'],
                                 self.conv1(params['conv1'], x)))
        outs = []
        for i, blocks in enumerate(self.layers):
            lp = params[f'layer{i + 1}']
            for j, blk in enumerate(blocks):
                x = blk(lp[str(j)], x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)

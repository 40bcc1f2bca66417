"""Res2Net backbone (ref: mmdet/models/backbones/res2net.py:13-327).

Bottle2neck: the 3x3 conv is split into ``scales`` hierarchical width-wise
branches; stage-opening blocks process splits independently ('stage' type)
and average-pool the last split when striding. Downsample is always
avg-pool + 1x1 conv (param names ``downsample.1/2`` match the torch
Sequential(AvgPool, Conv, BN)).

Note: the downsample avg-pool uses kernel=stride on even spatial dims,
where torch's ceil_mode/count_include_pad flags are no-ops (inputs here are
pad-bucketed to multiples of 32).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import BatchNorm, Conv2d, avg_pool2d, max_pool2d, Module
from .resnet import ResNet


class Bottle2neck(Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=False, style='pytorch', scales=4, base_width=26,
                 base_channels=64, stage_type='normal', dcn=None):
        assert scales > 1
        width = int(math.floor(planes * (base_width / base_channels)))
        if style == 'pytorch':
            conv1_stride, conv2_stride = 1, stride
        else:
            conv1_stride, conv2_stride = stride, 1
        self.scales = scales
        self.width = width
        self.stride = stride
        self.conv2_stride = conv2_stride
        self.stage_type = stage_type
        self.conv1 = Conv2d(inplanes, width * scales, 1,
                            stride=conv1_stride, bias=False,
                            weight_init='kaiming_fan_out')
        self.bn1 = BatchNorm(width * scales)
        self.convs = []
        self.bns = []
        for i in range(scales - 1):
            if dcn is not None:
                from ...ops.deform_conv import DeformConv2d
                self.convs.append(DeformConv2d(
                    width, width, 3, stride=conv2_stride, padding=dilation,
                    dilation=dilation, bias=False,
                    deform_groups=dcn.get('deform_groups', 1),
                    modulated=dcn.get('type') == 'DCNv2'
                    or dcn.get('modulated', False)))
            else:
                self.convs.append(Conv2d(
                    width, width, 3, stride=conv2_stride, padding=dilation,
                    dilation=dilation, bias=False,
                    weight_init='kaiming_fan_out'))
            self.bns.append(BatchNorm(width))
        self.conv3 = Conv2d(width * scales, planes * self.expansion, 1,
                            bias=False, weight_init='kaiming_fan_out')
        self.bn3 = BatchNorm(planes * self.expansion)
        self.has_downsample = downsample
        if downsample:
            self.ds_conv = Conv2d(inplanes, planes * self.expansion, 1,
                                  bias=False, weight_init='kaiming_fan_out')
            self.ds_bn = BatchNorm(planes * self.expansion)

    def init(self, key):
        keys = jax.random.split(key, 4 + len(self.convs))
        p = {'conv1': self.conv1.init(keys[0]),
             'bn1': self.bn1.init(keys[0]),
             'convs': {str(i): m.init(keys[1 + i])
                       for i, m in enumerate(self.convs)},
             'bns': {str(i): m.init(keys[1 + i])
                     for i, m in enumerate(self.bns)},
             'conv3': self.conv3.init(keys[-2]),
             'bn3': self.bn3.init(keys[-2])}
        if self.has_downsample:
            # Sequential(AvgPool, Conv, BN) -> indices 1, 2
            p['downsample'] = {'1': self.ds_conv.init(keys[-1]),
                               '2': self.ds_bn.init(keys[-1])}
        return p

    def __call__(self, params, x):
        identity = x
        out = jax.nn.relu(self.bn1(params['bn1'],
                                   self.conv1(params['conv1'], x)))
        w = self.width
        spx = [out[..., i * w:(i + 1) * w] for i in range(self.scales)]
        sp = self.convs[0](params['convs']['0'], spx[0])
        sp = jax.nn.relu(self.bns[0](params['bns']['0'], sp))
        outs = [sp]
        for i in range(1, self.scales - 1):
            sp_in = spx[i] if self.stage_type == 'stage' else sp + spx[i]
            sp = self.convs[i](params['convs'][str(i)], sp_in)
            sp = jax.nn.relu(self.bns[i](params['bns'][str(i)], sp))
            outs.append(sp)
        if self.stage_type == 'normal' or self.conv2_stride == 1:
            outs.append(spx[-1])
        else:
            outs.append(avg_pool2d(spx[-1], 3, self.conv2_stride,
                                   padding=1))
        out = jnp.concatenate(outs, -1)
        out = self.bn3(params['bn3'], self.conv3(params['conv3'], out))
        if self.has_downsample:
            ds = x if self.stride == 1 else avg_pool2d(x, self.stride,
                                                       self.stride)
            identity = self.ds_bn(params['downsample']['2'],
                                  self.ds_conv(params['downsample']['1'],
                                               ds))
        return jax.nn.relu(out + identity)


@BACKBONES.register_module()
class Res2Net(ResNet):
    arch_settings = {
        50: (Bottle2neck, (3, 4, 6, 3)),
        101: (Bottle2neck, (3, 4, 23, 3)),
        152: (Bottle2neck, (3, 8, 36, 3)),
    }

    def __init__(self, depth, scales=4, base_width=26, in_channels=3,
                 num_stages=4, strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                 out_indices=(0, 1, 2, 3), style='pytorch',
                 frozen_stages=-1, norm_cfg=None, norm_eval=True,
                 base_channels=64, dcn=None,
                 stage_with_dcn=(False, False, False, False), **kwargs):
        # Res2Net always uses the deep stem + avg_down layout
        block_cls, stage_blocks = self.arch_settings[depth]
        self.depth = depth
        self.num_stages = num_stages
        self.out_indices = tuple(out_indices)
        self.frozen_stages = frozen_stages
        self.deep_stem = True
        self.style = style
        self.block_cls = block_cls

        mid = base_channels // 2
        self.stem = [
            Conv2d(in_channels, mid, 3, stride=2, padding=1, bias=False,
                   weight_init='kaiming_fan_out'), BatchNorm(mid),
            Conv2d(mid, mid, 3, padding=1, bias=False,
                   weight_init='kaiming_fan_out'), BatchNorm(mid),
            Conv2d(mid, base_channels, 3, padding=1, bias=False,
                   weight_init='kaiming_fan_out'), BatchNorm(base_channels),
        ]
        self.layers = []
        inplanes = base_channels
        self.out_channels = []
        for i in range(num_stages):
            planes = base_channels * 2 ** i
            stride, dilation = strides[i], dilations[i]
            stage_dcn = dcn if (dcn is not None
                                and stage_with_dcn[i]) else None
            blocks = []
            for j in range(stage_blocks[i]):
                s = stride if j == 0 else 1
                need_ds = j == 0 and (
                    s != 1 or inplanes != planes * block_cls.expansion)
                blocks.append(Bottle2neck(
                    inplanes, planes, stride=s, dilation=dilation,
                    downsample=need_ds, style=style, scales=scales,
                    base_width=base_width, base_channels=base_channels,
                    stage_type='stage' if j == 0 else 'normal',
                    dcn=stage_dcn))
                inplanes = planes * block_cls.expansion
            self.layers.append(blocks)
            self.out_channels.append(planes * block_cls.expansion)

"""ResNeXt backbone (ref: mmdet/models/backbones/resnext.py)."""
from __future__ import annotations

import jax

from ...registry import BACKBONES
from ..layers import BatchNorm, Conv2d
from .resnet import Bottleneck, ResNet


class BottleneckX(Bottleneck):
    """Grouped bottleneck: mid channels scaled by groups * base_width / 64
    (ref: resnext.py:10-60)."""

    def __init__(self, inplanes, planes, groups=1, base_width=4, stride=1,
                 dilation=1, downsample=False, style='pytorch',
                 avg_down=False):
        super().__init__(inplanes, planes, stride=stride, dilation=dilation,
                         downsample=downsample, style=style,
                         avg_down=avg_down)
        if groups != 1:
            width = int(planes * (base_width / 64)) * groups
            conv1_stride = 1 if style == 'pytorch' else stride
            conv2_stride = stride if style == 'pytorch' else 1
            self.conv1 = Conv2d(inplanes, width, 1, stride=conv1_stride,
                                bias=False, weight_init='kaiming_fan_out')
            self.bn1 = BatchNorm(width)
            self.conv2 = Conv2d(width, width, 3, stride=conv2_stride,
                                padding=dilation, dilation=dilation,
                                groups=groups, bias=False,
                                weight_init='kaiming_fan_out')
            self.bn2 = BatchNorm(width)
            self.conv3 = Conv2d(width, planes * self.expansion, 1,
                                bias=False, weight_init='kaiming_fan_out')
            self.bn3 = BatchNorm(planes * self.expansion)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    arch_settings = {
        50: (BottleneckX, (3, 4, 6, 3)),
        101: (BottleneckX, (3, 4, 23, 3)),
        152: (BottleneckX, (3, 8, 36, 3)),
    }

    def __init__(self, groups=1, base_width=4, **kwargs):
        self.groups = groups
        self.base_width = base_width
        super().__init__(**kwargs)
        # rebuild stages with grouped bottlenecks
        block_cls, stage_blocks = self.arch_settings[self.depth]
        strides = kwargs.get('strides', (1, 2, 2, 2))
        dilations = kwargs.get('dilations', (1, 1, 1, 1))
        base_channels = kwargs.get('base_channels', 64)
        self.layers = []
        inplanes = base_channels
        for i in range(self.num_stages):
            planes = base_channels * 2 ** i
            blocks = []
            for j in range(stage_blocks[i]):
                s = strides[i] if j == 0 else 1
                need_ds = j == 0 and (s != 1 or
                                      inplanes != planes * 4)
                blocks.append(BottleneckX(
                    inplanes, planes, groups=groups, base_width=base_width,
                    stride=s, dilation=dilations[i], downsample=need_ds,
                    style=self.style))
                inplanes = planes * 4
            self.layers.append(blocks)

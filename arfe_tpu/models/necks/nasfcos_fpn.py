"""NAS-FCOS FPN (ref: mmdet/models/necks/nasfcos_fpn.py:9-140).

Searched concat-cell topology; outputs are bilinear-resized sums with f5.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.merge_cells import ConcatCell
from ...registry import NECKS
from ..layers import ConvModule, Module


def _bilinear(x, size):
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[3]), method='bilinear')


@NECKS.register_module()
class NASFCOS_FPN(Module):
    CELLS = ('c22_1', 'c22_2', 'c32', 'c02', 'c42', 'c36', 'c61')

    def __init__(self, in_channels, out_channels, num_outs, start_level=1,
                 end_level=-1, add_extra_convs=False, conv_cfg=None,
                 norm_cfg=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.num_ins = len(in_channels)
        self.num_outs = num_outs
        if end_level == -1:
            self.backbone_end_level = self.num_ins
        else:
            self.backbone_end_level = end_level
        self.start_level = start_level
        self.adapt_convs = [
            ConvModule(in_channels[i], out_channels, 1, bias=False,
                       norm_cfg=dict(type='BN'), act_cfg='relu',
                       weight_init='xavier')
            for i in range(start_level, self.backbone_end_level)]

        def cell(with_in1, with_in2):
            return ConcatCell(
                in_channels=out_channels, out_channels=out_channels,
                with_out_conv=True,
                out_conv_cfg=dict(kernel_size=1, padding=0, bias=False,
                                  groups=out_channels),
                out_norm_cfg=dict(type='BN'),
                out_conv_order=('norm', 'act', 'conv'),
                with_input1_conv=with_in1, with_input2_conv=with_in2,
                input_conv_cfg=conv_cfg, input_norm_cfg=norm_cfg)

        self.fpn = {
            'c22_1': cell(True, True), 'c22_2': cell(True, True),
            'c32': cell(True, False), 'c02': cell(True, False),
            'c42': cell(True, True), 'c36': cell(True, True),
            'c61': cell(True, True),
        }
        extra_levels = num_outs - self.backbone_end_level + start_level
        self.extra_downsamples = []
        for i in range(extra_levels):
            # order ('act', 'norm', 'conv'); first level has no act
            self.extra_downsamples.append(
                (i != 0, ConvModule(out_channels, out_channels, 3, stride=2,
                                    padding=1, act_cfg=None,
                                    weight_init='xavier')))

    def init(self, key):
        n = len(self.adapt_convs) + len(self.fpn) \
            + len(self.extra_downsamples)
        keys = jax.random.split(key, n)
        it = iter(keys)
        return {
            'adapt_convs': {str(i): m.init(next(it))
                            for i, m in enumerate(self.adapt_convs)},
            'fpn': {k: c.init(next(it)) for k, c in self.fpn.items()},
            'extra_downsamples': {
                str(i): m.init(next(it))
                for i, (_, m) in enumerate(self.extra_downsamples)},
        }

    def __call__(self, params, inputs):
        feats = [m(params['adapt_convs'][str(i)],
                   inputs[i + self.start_level])
                 for i, m in enumerate(self.adapt_convs)]
        for name in self.CELLS:
            i1, i2 = int(name[1]), int(name[2])
            feats.append(self.fpn[name](params['fpn'][name],
                                        feats[i1], feats[i2]))
        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1, f2 = feats[idx], feats[5]
            f2r = _bilinear(f2, (f1.shape[1], f1.shape[2]))
            s = f1 + f2r
            tgt = inputs[input_idx]
            ret.append(_bilinear(s, (tgt.shape[1], tgt.shape[2])))
        for i, (with_act, m) in enumerate(self.extra_downsamples):
            x = ret[-1]
            if with_act:
                x = jax.nn.relu(x)
            ret.append(m(params['extra_downsamples'][str(i)], x))
        return tuple(ret)

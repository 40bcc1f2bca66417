"""PAFPN and HRFPN necks (ref: mmdet/models/necks/pafpn.py, hrfpn.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import NECKS
from ..layers import (ConvModule, Module, avg_pool2d, max_pool2d,
                      resize_bilinear, resize_nearest)
from .fpn import FPN


@NECKS.register_module()
class PAFPN(FPN):
    """Path Aggregation FPN: adds a bottom-up path after the FPN top-down
    (ref: pafpn.py)."""

    def __init__(self, in_channels, out_channels, num_outs, **kwargs):
        super().__init__(in_channels, out_channels, num_outs, **kwargs)
        used = self.backbone_end_level - self.start_level
        self.downsample_convs = [
            ConvModule(out_channels, out_channels, 3, stride=2, padding=1,
                       act_cfg=None, weight_init='xavier')
            for _ in range(used - 1)]
        self.pafpn_convs = [
            ConvModule(out_channels, out_channels, 3, padding=1,
                       act_cfg=None, weight_init='xavier')
            for _ in range(used - 1)]

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = super().init(k1)
        p['downsample_convs'] = {
            str(i): m.init(jax.random.fold_in(k2, i))
            for i, m in enumerate(self.downsample_convs)}
        p['pafpn_convs'] = {
            str(i): m.init(jax.random.fold_in(k3, i))
            for i, m in enumerate(self.pafpn_convs)}
        return p

    def __call__(self, params, inputs):
        lp, fp = params['lateral_convs'], params['fpn_convs']
        laterals = [m(lp[str(i)], inputs[i + self.start_level])
                    for i, m in enumerate(self.lateral_convs)]
        used = len(laterals)
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        inter_outs = [self.fpn_convs[i](fp[str(i)], laterals[i])
                      for i in range(used)]
        # bottom-up aggregation
        for i in range(0, used - 1):
            inter_outs[i + 1] = inter_outs[i + 1] + self.downsample_convs[i](
                params['downsample_convs'][str(i)], inter_outs[i])
        outs = [inter_outs[0]]
        outs += [self.pafpn_convs[i - 1](params['pafpn_convs'][str(i - 1)],
                                         inter_outs[i])
                 for i in range(1, used)]
        if self.num_outs > used:
            if not self.add_extra_convs:
                for _ in range(self.num_outs - used):
                    outs.append(max_pool2d(outs[-1], 1, stride=2))
            else:
                if self.add_extra_convs == 'on_input':
                    extra_source = inputs[self.backbone_end_level - 1]
                elif self.add_extra_convs == 'on_lateral':
                    extra_source = laterals[-1]
                else:
                    extra_source = outs[-1]
                outs.append(self.fpn_convs[used](fp[str(used)],
                                                 extra_source))
                for i in range(used + 1, self.num_outs):
                    src = jax.nn.relu(outs[-1]) \
                        if self.relu_before_extra_convs else outs[-1]
                    outs.append(self.fpn_convs[i](fp[str(i)], src))
        return tuple(outs)


@NECKS.register_module()
class HRFPN(Module):
    """HRNet feature pyramid (ref: hrfpn.py): concat all branch outputs at
    the highest resolution, 1x1 reduce, then stride-pool to num_outs levels
    with 3x3 convs."""

    def __init__(self, in_channels, out_channels, num_outs=5,
                 pooling_type='AVG', conv_cfg=None, norm_cfg=None,
                 stride=1):
        self.in_channels = list(in_channels)
        self.out_channels = out_channels
        self.num_outs = num_outs
        self.pooling_type = pooling_type
        self.reduction_conv = ConvModule(sum(in_channels), out_channels, 1,
                                         act_cfg=None, weight_init='xavier')
        self.fpn_convs = [
            ConvModule(out_channels, out_channels, 3, padding=1,
                       stride=stride, act_cfg=None, weight_init='xavier')
            for _ in range(num_outs)]

    def init(self, key):
        keys = jax.random.split(key, self.num_outs + 1)
        return {'reduction_conv': self.reduction_conv.init(keys[0]),
                'fpn_convs': {str(i): m.init(keys[i + 1])
                              for i, m in enumerate(self.fpn_convs)}}

    def __call__(self, params, inputs):
        assert len(inputs) == len(self.in_channels)
        target = inputs[0].shape[1:3]
        outs = [inputs[0]] + [resize_bilinear(x, target) for x in inputs[1:]]
        out = jnp.concatenate(outs, axis=-1)
        out = self.reduction_conv(params['reduction_conv'], out)
        pool = avg_pool2d if self.pooling_type == 'AVG' else max_pool2d
        feats = [out]
        for i in range(1, self.num_outs):
            feats.append(pool(out, 2 ** i, stride=2 ** i))
        return tuple(self.fpn_convs[i](params['fpn_convs'][str(i)], f)
                     for i, f in enumerate(feats))
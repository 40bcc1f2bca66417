"""AR-FPN: adaptive region-aware pyramid refinement necks.

TPU-native counterpart of the ARFE paper's shipped AR-FPN implementation,
``WFPNDualSpatial`` (ref: mmdet/models/necks/wfpn_dual_spatial.py:11-137):
gather all levels to the ``refine_level`` resolution (adaptive max-pool down
/ nearest up), average, refine with a NonLocal2D block, then per level form a
dual tanh attention map (two 3x3 -> 1ch convs) multiplied with the resized
refined feature and added residually:
``out_i = in_i + resize(bsf, size_i) * (tanh(conv_b(in_i)) + tanh(conv_c(in_i)))``.

Applied after a vanilla FPN via a 2-element neck list
(ref: configs/mytrain/faster_rcnn_r50_drfpn_drrff+fac_1x_coco.py:21-27).

Also provides ``BFP`` (Libra R-CNN balanced feature pyramid,
ref: mmdet/models/necks/bfp.py) which shares the gather/refine/scatter
skeleton.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.non_local import NonLocal2D
from ...registry import NECKS
from ..layers import ConvModule, Module, adaptive_max_pool2d, resize_nearest


def _gather_levels(inputs, refine_level):
    """Resize every level to the refine_level resolution and average."""
    gather_size = inputs[refine_level].shape[1:3]
    feats = []
    for i, x in enumerate(inputs):
        if i < refine_level:
            feats.append(adaptive_max_pool2d(x, gather_size))
        else:
            feats.append(resize_nearest(x, gather_size))
    return sum(feats) / len(feats)


@NECKS.register_module()
class WFPNDualSpatial(Module):
    def __init__(self, in_channels, num_levels, refine_level=2,
                 conv_cfg=None, norm_cfg=None):
        self.in_channels = in_channels
        self.num_levels = num_levels
        self.refine_level = refine_level
        self.reduce_convs = [
            ConvModule(in_channels, 1, 3, padding=1, norm_cfg=norm_cfg,
                       act_cfg='relu', weight_init='xavier')
            for _ in range(num_levels)]
        self.reduce_convs2 = [
            ConvModule(in_channels, 1, 3, padding=1, norm_cfg=norm_cfg,
                       act_cfg='relu', weight_init='xavier')
            for _ in range(num_levels)]
        self.refine = NonLocal2D(in_channels, reduction=1, use_scale=False,
                                 norm_cfg=norm_cfg)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.num_levels + 1)
        return {
            'reduce_convs': {str(i): m.init(keys[i])
                             for i, m in enumerate(self.reduce_convs)},
            'reduce_convs2': {
                str(i): m.init(keys[self.num_levels + i])
                for i, m in enumerate(self.reduce_convs2)},
            'refine': self.refine.init(keys[-1]),
        }

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        ori_fe = _gather_levels(inputs, self.refine_level)
        bsf = self.refine(params['refine'], ori_fe)
        outs = []
        for i, x in enumerate(inputs):
            # ref applies ConvModule (conv+ReLU) then tanh
            # (wfpn_dual_spatial.py:120-121)
            basic_map = jnp.tanh(self.reduce_convs[i](
                params['reduce_convs'][str(i)], x))
            com_map = jnp.tanh(self.reduce_convs2[i](
                params['reduce_convs2'][str(i)], x))
            resized = resize_nearest(bsf, x.shape[1:3])
            outs.append(x + resized * (basic_map + com_map))
        return tuple(outs)


@NECKS.register_module()
class BFP(Module):
    """Balanced Feature Pyramid (Libra R-CNN)
    (ref: mmdet/models/necks/bfp.py): gather -> refine (non-local or conv)
    -> scatter residual add."""

    def __init__(self, in_channels, num_levels, refine_level=2,
                 refine_type=None, conv_cfg=None, norm_cfg=None):
        assert refine_type in (None, 'conv', 'non_local')
        self.in_channels = in_channels
        self.num_levels = num_levels
        self.refine_level = refine_level
        self.refine_type = refine_type
        if refine_type == 'conv':
            self.refine = ConvModule(in_channels, in_channels, 3, padding=1,
                                     norm_cfg=norm_cfg, act_cfg='relu',
                                     weight_init='xavier')
        elif refine_type == 'non_local':
            self.refine = NonLocal2D(in_channels, reduction=1,
                                     use_scale=False, norm_cfg=norm_cfg)

    def init(self, key):
        if self.refine_type is None:
            return {}
        return {'refine': self.refine.init(key)}

    def __call__(self, params, inputs):
        assert len(inputs) == self.num_levels
        bsf = _gather_levels(inputs, self.refine_level)
        if self.refine_type is not None:
            bsf = self.refine(params['refine'], bsf)
        outs = []
        for i, x in enumerate(inputs):
            size = x.shape[1:3]
            if i < self.refine_level:
                residual = resize_nearest(bsf, size)
            else:
                residual = adaptive_max_pool2d(bsf, size)
            outs.append(x + residual)
        return tuple(outs)

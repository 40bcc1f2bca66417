"""NAS-FPN / NAS-FCOS merge cells (ref: mmdet/ops/merge_cells.py:9-148).

Functional NHWC rewrite; the out-conv uses the reference's
('act', 'conv', 'norm') order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import Conv2d, ConvModule, build_norm, max_pool2d


def _resize(x, size):
    """Resize NHWC ``x`` to (h, w): nearest-upsample (torch
    ``F.interpolate(mode='nearest')`` index math: src = floor(i * h / th))
    or integer max-pool (ref: merge_cells.py:93-100)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = size
    if (h, w) == (th, tw):
        return x
    if h < th:
        ridx = (jnp.arange(th) * h // th).astype(jnp.int32)
        cidx = (jnp.arange(tw) * w // tw).astype(jnp.int32)
        return x[:, ridx][:, :, cidx]
    k = w // tw
    return max_pool2d(x, k, stride=k)


class BaseMergeCell:
    def __init__(self, fused_channels=256, out_channels=256,
                 with_out_conv=True, out_conv_cfg=None, out_norm_cfg=None,
                 out_conv_order=('act', 'conv', 'norm'),
                 with_input1_conv=False, with_input2_conv=False,
                 input_conv_cfg=None, input_norm_cfg=None,
                 upsample_mode='nearest'):
        out_conv_cfg = out_conv_cfg or dict(groups=1, kernel_size=3,
                                            padding=1, bias=True)
        self.with_out_conv = with_out_conv
        self.out_conv_order = tuple(out_conv_order)
        self.upsample_mode = upsample_mode
        self.with_input1_conv = with_input1_conv
        self.with_input2_conv = with_input2_conv
        if with_out_conv:
            self.out_conv = Conv2d(
                fused_channels, out_channels,
                out_conv_cfg['kernel_size'],
                padding=out_conv_cfg.get('padding', 0),
                groups=out_conv_cfg.get('groups', 1),
                bias=out_conv_cfg.get('bias', True),
                weight_init='xavier')
            # norm-before-conv orders normalize the fused input channels
            norm_ch = (fused_channels
                       if self.out_conv_order.index('norm')
                       < self.out_conv_order.index('conv')
                       else out_channels)
            self.out_norm = build_norm(out_norm_cfg, norm_ch) \
                if out_norm_cfg else None
        if with_input1_conv:
            self.input1_conv = ConvModule(
                out_channels, out_channels, 3, padding=1,
                norm_cfg=input_norm_cfg, act_cfg='relu', bias=True,
                weight_init='xavier')
        if with_input2_conv:
            self.input2_conv = ConvModule(
                out_channels, out_channels, 3, padding=1,
                norm_cfg=input_norm_cfg, act_cfg='relu', bias=True,
                weight_init='xavier')

    def init(self, key):
        keys = jax.random.split(key, 4)
        p = {}
        if self.with_out_conv:
            p['out_conv'] = {'conv': self.out_conv.init(keys[0])}
            if self.out_norm is not None:
                p['out_conv']['bn'] = self.out_norm.init(keys[1])
        if self.with_input1_conv:
            p['input1_conv'] = self.input1_conv.init(keys[2])
        if self.with_input2_conv:
            p['input2_conv'] = self.input2_conv.init(keys[3])
        return p

    def _binary_op(self, params, x1, x2):
        raise NotImplementedError

    def __call__(self, params, x1, x2, out_size=None):
        if out_size is None:
            out_size = max((x1.shape[1], x1.shape[2]),
                           (x2.shape[1], x2.shape[2]))
        if self.with_input1_conv:
            x1 = self.input1_conv(params['input1_conv'], x1)
        if self.with_input2_conv:
            x2 = self.input2_conv(params['input2_conv'], x2)
        x1 = _resize(x1, out_size)
        x2 = _resize(x2, out_size)
        x = self._binary_op(params, x1, x2)
        if self.with_out_conv:
            for step in self.out_conv_order:
                if step == 'act':
                    x = jax.nn.relu(x)
                elif step == 'conv':
                    x = self.out_conv(params['out_conv']['conv'], x)
                elif step == 'norm' and self.out_norm is not None:
                    x = self.out_norm(params['out_conv']['bn'], x)
        return x


class SumCell(BaseMergeCell):
    def __init__(self, in_channels, out_channels, **kw):
        super().__init__(in_channels, out_channels, **kw)

    def _binary_op(self, params, x1, x2):
        return x1 + x2


class ConcatCell(BaseMergeCell):
    def __init__(self, in_channels, out_channels, **kw):
        super().__init__(in_channels * 2, out_channels, **kw)

    def _binary_op(self, params, x1, x2):
        return jnp.concatenate([x1, x2], -1)


class GlobalPoolingCell(BaseMergeCell):
    def __init__(self, in_channels=None, out_channels=None, **kw):
        super().__init__(in_channels, out_channels, **kw)

    def _binary_op(self, params, x1, x2):
        att = jax.nn.sigmoid(x2.mean(axis=(1, 2), keepdims=True))
        return x2 + att * x1

"""NonLocal2D self-attention block (used by AR-FPN).

TPU-native counterpart of ref: mmdet/ops/non_local.py:6-105 (embedded-gaussian
theta/phi/g 1x1 convs + matmul softmax). On TPU this is three 1x1 convs
(MXU matmuls over channels) + one (HW, HW) attention matmul — XLA fuses it
well at AR-FPN's token count (HW of the stride-16 level, ~2k-4k tokens).
Param tree mirrors the reference: g/theta/phi/conv_out each a ConvModule
('conv' child).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import ConvModule, Module


class NonLocal2D(Module):
    def __init__(self, in_channels, reduction=2, use_scale=True,
                 conv_cfg=None, norm_cfg=None, mode='embedded_gaussian'):
        assert mode in ('embedded_gaussian', 'dot_product')
        self.in_channels = in_channels
        self.reduction = reduction
        self.use_scale = use_scale
        self.inter_channels = in_channels // reduction
        self.mode = mode
        self.g = ConvModule(in_channels, self.inter_channels, 1, act_cfg=None,
                            weight_init='normal', init_std=0.01)
        self.theta = ConvModule(in_channels, self.inter_channels, 1,
                                act_cfg=None, weight_init='normal',
                                init_std=0.01)
        self.phi = ConvModule(in_channels, self.inter_channels, 1,
                              act_cfg=None, weight_init='normal',
                              init_std=0.01)
        self.conv_out = ConvModule(self.inter_channels, in_channels, 1,
                                   norm_cfg=norm_cfg, act_cfg=None,
                                   weight_init='normal', init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {'g': self.g.init(keys[0]),
                  'theta': self.theta.init(keys[1]),
                  'phi': self.phi.init(keys[2]),
                  'conv_out': self.conv_out.init(keys[3])}
        # zero-init conv_out so the block starts as identity
        # (ref: non_local.py:56-61 zeros_init=True)
        params['conv_out']['conv']['weight'] = jnp.zeros_like(
            params['conv_out']['conv']['weight'])
        if 'bias' in params['conv_out']['conv']:
            params['conv_out']['conv']['bias'] = jnp.zeros_like(
                params['conv_out']['conv']['bias'])
        return params

    def __call__(self, params, x):
        n, h, w, _ = x.shape
        ic = self.inter_channels
        if all(set(params[k]) == {'conv'} for k in ('g', 'theta', 'phi')):
            # three sibling 1x1 convs on the same input -> one stacked
            # conv (XLA does not fuse them); stored params stay separate
            w3 = jnp.concatenate([params[k]['conv']['weight']
                                  for k in ('g', 'theta', 'phi')], axis=-1)
            b3 = jnp.concatenate([params[k]['conv']['bias']
                                  for k in ('g', 'theta', 'phi')])
            gtp = jax.lax.conv_general_dilated(
                x, w3.astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) \
                + b3.astype(x.dtype)
            gtp = gtp.reshape(n, h * w, 3 * ic)
            g_x = gtp[..., :ic]
            theta_x = gtp[..., ic:2 * ic]
            phi_x = gtp[..., 2 * ic:]
        else:
            g_x = self.g(params['g'], x).reshape(n, h * w, ic)
            theta_x = self.theta(params['theta'], x).reshape(n, h * w, ic)
            phi_x = self.phi(params['phi'], x).reshape(n, h * w, ic)
        if self.mode == 'embedded_gaussian':
            # fused Pallas attention on TPU: the (HW, HW) pairwise tile
            # stays in VMEM (ops/pallas_attention.py); XLA path elsewhere
            from .pallas_attention import attention_auto
            scale = (1.0 / float(ic) ** 0.5) if self.use_scale else None
            y = attention_auto(theta_x, phi_x, g_x, scale)
        else:  # dot_product
            pairwise = jnp.einsum('nqc,nkc->nqk', theta_x, phi_x,
                                  preferred_element_type=jnp.float32)
            pairwise = pairwise / float(h * w)
            y = jnp.einsum('nqk,nkc->nqc', pairwise.astype(g_x.dtype), g_x,
                           preferred_element_type=jnp.float32)
        y = y.reshape(n, h, w, ic).astype(x.dtype)
        return x + self.conv_out(params['conv_out'], y)

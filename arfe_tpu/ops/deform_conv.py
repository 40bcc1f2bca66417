"""Deformable convolution v1/v2 (jnp: bilinear gather + einsum).

TPU-native counterpart of ref: mmdet/ops/dcn/ (deform_conv_cuda*.cu 1,716
LoC of im2col kernels; python surface ops/dcn/deform_conv.py:191-433).
The im2col-with-learned-offsets becomes a batched bilinear sample over the
k*k taps followed by one einsum contraction — XLA maps the contraction to
the MXU; the gather is dense per-pixel (regular access, unlike RoIAlign's
scattered one) so XLA handles it adequately.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import Conv2d, Module


def _bilinear_sample_map(x, ys, xs):
    """x: (H, W, C); ys/xs: (...,) sample coords. Returns (..., C) with
    zeros outside (matching the CUDA kernel's boundary behavior)."""
    h, w, _ = x.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    yc = jnp.clip(ys, 0.0, h - 1.0)
    xc = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = yc - y0
    wx = xc - x0
    v00 = x[y0, x0]
    v01 = x[y0, x1]
    v10 = x[y1, x0]
    v11 = x[y1, x1]
    out = (v00 * ((1 - wy) * (1 - wx))[..., None]
           + v01 * ((1 - wy) * wx)[..., None]
           + v10 * (wy * (1 - wx))[..., None]
           + v11 * (wy * wx)[..., None])
    return out * valid[..., None]


def deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                  groups=1, deform_groups=1, mask=None, bias=None):
    """NHWC deformable conv.

    Args:
        x: (B, H, W, Cin).
        offset: (B, Ho, Wo, deform_groups*2*kh*kw) — (dy, dx) per tap,
            ordered (dg, kh, kw, 2) like the reference's channel layout.
        weight: (kh, kw, Cin//groups, Cout) HWIO.
        mask: optional (B, Ho, Wo, deform_groups*kh*kw) modulation (v2).
    Returns:
        (B, Ho, Wo, Cout)
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    sh = sw = stride if isinstance(stride, int) else stride[0]
    ph = pw = padding if isinstance(padding, int) else padding[0]
    dh = dw = dilation if isinstance(dilation, int) else dilation[0]
    ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1

    base_y = (np.arange(ho) * sh - ph)[:, None, None] \
        + (np.arange(kh) * dh)[None, :, None]                 # (ho, kh, 1)
    base_x = (np.arange(wo) * sw - pw)[:, None, None] \
        + (np.arange(kw) * dw)[None, :, None]                 # (wo, kw, 1)
    base_y = jnp.asarray(base_y, jnp.float32)
    base_x = jnp.asarray(base_x, jnp.float32)

    off = offset.reshape(b, ho, wo, deform_groups, kh, kw, 2)

    def one_image(xi, offi, maski):
        # coords per (ho, wo, dg, kh, kw)
        ys = base_y[:, None, None, :, None, 0] + offi[..., 0]
        xs = base_x[None, :, None, None, :, 0] + offi[..., 1]
        ys = jnp.broadcast_to(ys, (ho, wo, deform_groups, kh, kw))
        xs = jnp.broadcast_to(xs, (ho, wo, deform_groups, kh, kw))
        samp = _bilinear_sample_map(xi, ys, xs)  # (ho,wo,dg,kh,kw,C)
        if maski is not None:
            samp = samp * maski[..., None]
        # each deform group's offsets apply to its own channel slice
        if deform_groups == 1:
            samp = samp[:, :, 0]                  # (ho, wo, kh, kw, cin)
        else:
            cg = cin // deform_groups
            samp = samp.reshape(ho, wo, deform_groups, kh, kw,
                                deform_groups, cg)
            idx = jnp.arange(deform_groups)
            samp = samp[:, :, idx, :, :, idx]     # (dg, ho, wo, kh, kw, cg)
            samp = jnp.moveaxis(samp, 0, -2)      # (ho, wo, kh, kw, dg, cg)
            samp = samp.reshape(ho, wo, kh, kw, cin)
        if groups == 1:
            return jnp.einsum('hwijc,ijco->hwo', samp, weight,
                              preferred_element_type=jnp.float32)
        cing = cin // groups
        coutg = cout // groups
        samp_g = samp.reshape(ho, wo, kh, kw, groups, cing)
        w_g = weight.reshape(kh, kw, cing, groups, coutg)
        out = jnp.einsum('hwijgc,ijcgo->hwgo', samp_g, w_g,
                         preferred_element_type=jnp.float32)
        return out.reshape(ho, wo, cout)

    if mask is not None:
        masks = mask.reshape(b, ho, wo, deform_groups, kh, kw)
        out = jax.vmap(one_image)(x, off, masks)
    else:
        out = jax.vmap(lambda xi, offi: one_image(xi, offi, None))(x, off)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class DeformConv2d(Module):
    """v1 pack: offsets predicted by a plain conv
    (ref: ops/dcn/deform_conv.py:191-280 DeformConvPack)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deform_groups=1,
                 bias=False, modulated=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size if isinstance(kernel_size, tuple) \
            else (kernel_size, kernel_size)
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.deform_groups = deform_groups
        self.with_bias = bias
        self.modulated = modulated
        kh, kw = self.kernel_size
        off_ch = deform_groups * (3 if modulated else 2) * kh * kw
        self.conv_offset = Conv2d(in_channels, off_ch, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, bias=True)
        self.weight_shape = (kh, kw, in_channels // groups, out_channels)

    def init(self, key):
        import math
        k1, k2 = jax.random.split(key)
        kh, kw, cing, cout = self.weight_shape
        fan_in = kh * kw * cing
        bound = math.sqrt(1.0 / fan_in)
        p = {'weight': jax.random.uniform(k1, self.weight_shape,
                                          jnp.float32, -bound, bound),
             # offset conv zero-init so DCN starts as a plain conv
             'conv_offset': jax.tree_util.tree_map(
                 jnp.zeros_like, self.conv_offset.init(k2))}
        if self.with_bias:
            p['bias'] = jnp.zeros((cout,), jnp.float32)
        return p

    def __call__(self, params, x):
        off_out = self.conv_offset(params['conv_offset'], x)
        kh, kw = self.kernel_size
        dg = self.deform_groups
        if self.modulated:
            o = off_out[..., :dg * 2 * kh * kw]
            m = jax.nn.sigmoid(off_out[..., dg * 2 * kh * kw:])
        else:
            o, m = off_out, None
        return deform_conv2d(x, o, params['weight'], self.stride,
                             self.padding, self.dilation, self.groups,
                             dg, mask=m, bias=params.get('bias'))


class ModulatedDeformConv2d(DeformConv2d):
    """v2 pack (ref: ops/dcn/deform_conv.py:281-433
    ModulatedDeformConvPack)."""

    def __init__(self, *args, **kwargs):
        kwargs['modulated'] = True
        super().__init__(*args, **kwargs)

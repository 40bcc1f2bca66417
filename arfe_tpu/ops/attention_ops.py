"""Attention/context ops riding along with the native-op set.

- ContextBlock (GCNet) — ref: mmdet/ops/context_block.py
- GeneralizedAttention — ref: mmdet/ops/generalized_attention.py (384 LoC;
  the core '1100' content-content mode implemented; positional modes are
  round-2)
- ConvWS2d (weight standardization) — ref: mmdet/ops/conv_ws.py
- MaskedConv2d — ref: mmdet/ops/masked_conv (dense conv + mask multiply:
  TPUs prefer dense compute over the reference's sparse CUDA kernel)
- CARAFE — ref: mmdet/ops/carafe/ (content-aware upsampling as
  unfold+einsum; XLA fuses it)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..layers import Conv2d, ConvModule, Module


class ContextBlock(Module):
    """GCNet context block (ref: ops/context_block.py)."""

    def __init__(self, in_channels, ratio, pooling_type='att',
                 fusion_types=('channel_add',)):
        assert pooling_type in ('avg', 'att')
        self.in_channels = in_channels
        self.planes = int(in_channels * ratio)
        self.pooling_type = pooling_type
        self.fusion_types = tuple(fusion_types)
        if pooling_type == 'att':
            self.conv_mask = Conv2d(in_channels, 1, 1,
                                    weight_init='normal', init_std=0.01)
        if 'channel_add' in self.fusion_types:
            self.channel_add_conv = _ChannelConv(in_channels, self.planes)
        if 'channel_mul' in self.fusion_types:
            self.channel_mul_conv = _ChannelConv(in_channels, self.planes)

    def init(self, key):
        keys = jax.random.split(key, 3)
        p = {}
        if self.pooling_type == 'att':
            p['conv_mask'] = self.conv_mask.init(keys[0])
        if 'channel_add' in self.fusion_types:
            p['channel_add_conv'] = self.channel_add_conv.init(keys[1])
        if 'channel_mul' in self.fusion_types:
            p['channel_mul_conv'] = self.channel_mul_conv.init(keys[2])
        return p

    def spatial_pool(self, params, x):
        n, h, w, c = x.shape
        if self.pooling_type == 'att':
            mask = self.conv_mask(params['conv_mask'], x)      # (n,h,w,1)
            mask = jax.nn.softmax(mask.reshape(n, h * w, 1), axis=1)
            ctx = jnp.einsum('nkc,nko->noc', x.reshape(n, h * w, c), mask)
            return ctx.reshape(n, 1, 1, c)
        return x.mean(axis=(1, 2), keepdims=True)

    def __call__(self, params, x):
        ctx = self.spatial_pool(params, x)
        out = x
        if 'channel_mul' in self.fusion_types:
            out = out * jax.nn.sigmoid(self.channel_mul_conv(
                params['channel_mul_conv'], ctx))
        if 'channel_add' in self.fusion_types:
            out = out + self.channel_add_conv(params['channel_add_conv'],
                                              ctx)
        return out


class _ChannelConv(Module):
    """1x1 -> LN -> ReLU -> 1x1 bottleneck on pooled context."""

    def __init__(self, channels, planes):
        self.c1 = Conv2d(channels, planes, 1)
        self.c2 = Conv2d(planes, channels, 1)
        self.planes = planes

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'0': self.c1.init(k1),
                'ln': {'weight': jnp.ones((self.planes,)),
                       'bias': jnp.zeros((self.planes,))},
                '3': jax.tree_util.tree_map(jnp.zeros_like,
                                            self.c2.init(k2))}

    def __call__(self, params, x):
        y = self.c1(params['0'], x)
        mean = y.mean(axis=-1, keepdims=True)
        var = ((y - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * params['ln']['weight'] + params['ln']['bias']
        return self.c2(params['3'], jax.nn.relu(y))


class GeneralizedAttention(Module):
    """Empirical generalized attention, all four factorization terms
    (ref: ops/generalized_attention.py:10-385).

    ``attention_type`` bits: [0] query-content x key-content,
    [1] query-content x relative-position, [2] key-content saliency bias,
    [3] relative-position-only bias. Position energies are separable in
    x/y, exactly as the reference computes them (no 1/sqrt(d) scaling —
    the reference has none).
    """

    def __init__(self, in_channels, spatial_range=-1, num_heads=9,
                 position_embedding_dim=-1, position_magnitude=1,
                 kv_stride=2, q_stride=1, attention_type='1111'):
        self.in_channels = in_channels
        self.num_heads = num_heads
        self.kv_stride = kv_stride
        self.q_stride = q_stride
        self.spatial_range = spatial_range
        self.position_magnitude = position_magnitude
        self.position_embedding_dim = (position_embedding_dim
                                       if position_embedding_dim > 0
                                       else in_channels)
        self.attention_type = [bool(int(b)) for b in attention_type]
        self.qk_embed_dim = in_channels // num_heads
        out_c = self.qk_embed_dim * num_heads
        self.out_c = out_c
        at = self.attention_type
        if at[0] or at[1]:
            self.query_conv = Conv2d(in_channels, out_c, 1, bias=False,
                                     weight_init='torch_default')
        if at[0] or at[2]:
            self.key_conv = Conv2d(in_channels, out_c, 1, bias=False,
                                   weight_init='torch_default')
        self.v_dim = in_channels // num_heads
        self.value_conv = Conv2d(in_channels, self.v_dim * num_heads, 1,
                                 bias=False, weight_init='torch_default')
        if at[1] or at[3]:
            from ..layers import Linear
            self.appr_geom_fc_x = Linear(self.position_embedding_dim // 2,
                                         out_c, bias=False)
            self.appr_geom_fc_y = Linear(self.position_embedding_dim // 2,
                                         out_c, bias=False)
        self.proj_conv = Conv2d(self.v_dim * num_heads, in_channels, 1,
                                weight_init='torch_default')

    def init(self, key):
        import math
        keys = jax.random.split(key, 8)
        at = self.attention_type
        p = {'value_conv': self.value_conv.init(keys[2]),
             'proj_conv': self.proj_conv.init(keys[3]),
             'gamma': jnp.zeros((1,))}
        if at[0] or at[1]:
            p['query_conv'] = self.query_conv.init(keys[0])
        if at[0] or at[2]:
            p['key_conv'] = self.key_conv.init(keys[1])
        if at[1] or at[3]:
            p['appr_geom_fc_x'] = self.appr_geom_fc_x.init(keys[4])
            p['appr_geom_fc_y'] = self.appr_geom_fc_y.init(keys[5])
        stdv = 1.0 / math.sqrt(self.qk_embed_dim * 2)
        if at[2]:
            p['appr_bias'] = jax.random.uniform(
                keys[6], (self.out_c,), jnp.float32, -stdv, stdv)
        if at[3]:
            p['geom_bias'] = jax.random.uniform(
                keys[7], (self.out_c,), jnp.float32, -stdv, stdv)
        return p

    def _position_embedding(self, h, w, hk, wk, wave_length=1000):
        """(ref: get_position_embedding, generalized_attention.py:153-195)."""
        feat_dim = self.position_embedding_dim
        h_idx = jnp.arange(h, dtype=jnp.float32) * self.q_stride
        w_idx = jnp.arange(w, dtype=jnp.float32) * self.q_stride
        hk_idx = jnp.arange(hk, dtype=jnp.float32) * self.kv_stride
        wk_idx = jnp.arange(wk, dtype=jnp.float32) * self.kv_stride
        h_diff = (h_idx[:, None] - hk_idx[None, :]) * self.position_magnitude
        w_diff = (w_idx[:, None] - wk_idx[None, :]) * self.position_magnitude
        feat_range = jnp.arange(feat_dim // 4, dtype=jnp.float32)
        dim_mat = wave_length ** ((4. / feat_dim) * feat_range)
        ex = jnp.concatenate([jnp.sin(w_diff[..., None] / dim_mat),
                              jnp.cos(w_diff[..., None] / dim_mat)], -1)
        ey = jnp.concatenate([jnp.sin(h_diff[..., None] / dim_mat),
                              jnp.cos(h_diff[..., None] / dim_mat)], -1)
        return ex, ey                                  # (w, wk, D/2), (h, hk, D/2)

    def __call__(self, params, x):
        import math
        at = self.attention_type
        n, _, _, c = x.shape
        xq = x[:, ::self.q_stride, ::self.q_stride, :] \
            if self.q_stride > 1 else x
        h, w = xq.shape[1:3]
        kv = x[:, ::self.kv_stride, ::self.kv_stride, :] \
            if self.kv_stride > 1 else x
        hk, wk = kv.shape[1:3]
        nh, d = self.num_heads, self.qk_embed_dim

        if at[0] or at[1]:
            q = self.query_conv(params['query_conv'], xq).reshape(
                n, h, w, nh, d).astype(jnp.float32)
        if at[0] or at[2]:
            k = self.key_conv(params['key_conv'], kv).reshape(
                n, hk, wk, nh, d).astype(jnp.float32)
        if at[1] or at[3]:
            ex, ey = self._position_embedding(h, w, hk, wk)
            # (w, wk, nh, d) / (h, hk, nh, d), scaled by 1/sqrt(2)
            fx = self.appr_geom_fc_x(params['appr_geom_fc_x'], ex).reshape(
                w, wk, nh, d) / math.sqrt(2)
            fy = self.appr_geom_fc_y(params['appr_geom_fc_y'], ey).reshape(
                h, hk, nh, d) / math.sqrt(2)

        energy = jnp.zeros((n, nh, h, w, hk, wk), jnp.float32)
        if at[0] and at[2]:
            qb = q + params['appr_bias'].reshape(nh, d)
            energy = energy + jnp.einsum('nhwed,nkled->nehwkl', qb, k)
        elif at[0]:
            energy = energy + jnp.einsum('nhwed,nkled->nehwkl', q, k)
        elif at[2]:
            ab = params['appr_bias'].reshape(nh, d)
            energy = energy + jnp.einsum(
                'ed,nkled->nekl', ab, k)[:, :, None, None]
        if at[1] or at[3]:
            if at[1]:
                qg = q + params['geom_bias'].reshape(nh, d) if at[3] else q
                # e_x: (n, nh, h, w, wk); e_y: (n, nh, h, w, hk)
                e_x = jnp.einsum('nhwed,wled->nehwl', qg, fx)
                e_y = jnp.einsum('nhwed,hked->nehwk', qg, fy)
                energy = energy + e_x[:, :, :, :, None, :] \
                    + e_y[:, :, :, :, :, None]
            else:  # position-only bias term
                gb = params['geom_bias'].reshape(nh, d)
                e_x = jnp.einsum('wled,ed->ewl', fx, gb)   # (nh, w, wk)
                e_y = jnp.einsum('hked,ed->ehk', fy, gb)   # (nh, h, hk)
                energy = energy \
                    + e_x[None, :, None, :, None, :] \
                    + e_y[None, :, :, None, :, None]

        energy = energy.reshape(n, nh, h * w, hk * wk)
        attn = jax.nn.softmax(energy, axis=-1)
        v = self.value_conv(params['value_conv'], kv).reshape(
            n, hk * wk, nh, self.v_dim)
        out = jnp.einsum('nhqk,nkhv->nqhv', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(n, h, w, nh * self.v_dim).astype(x.dtype)
        out = self.proj_conv(params['proj_conv'], out)
        return x + params['gamma'] * out


class ConvWS2d(Conv2d):
    """Weight-standardized conv (ref: ops/conv_ws.py)."""

    def __init__(self, *args, eps=1e-5, **kwargs):
        self.eps = eps
        super().__init__(*args, **kwargs)

    def __call__(self, params, x):
        w = params['weight']
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        std = w.std(axis=(0, 1, 2), keepdims=True) + self.eps
        params = dict(params, weight=(w - mean) / std)
        return super().__call__(params, x)


class MaskedConv2d(Conv2d):
    """Conv evaluated only at masked positions (ref: ops/masked_conv) —
    dense conv + mask multiply, the TPU-preferred formulation."""

    def __call__(self, params, x, mask=None):
        out = super().__call__(params, x)
        if mask is not None:
            out = out * (mask > 0).astype(out.dtype)[..., None]
        return out


def carafe(features, masks, kernel_size=5, group_size=1, scale_factor=2):
    """CARAFE content-aware reassembly (ref: ops/carafe/carafe.py semantics;
    kernels normalized by the caller as in CARAFEPack.kernel_normalizer).

    Args:
        features: (n, h, w, c).
        masks: (n, h*scale, w*scale, k*k) softmax-normalized kernels.
    Returns:
        (n, h*scale, w*scale, c)
    """
    n, h, w, c = features.shape
    k = kernel_size
    s = scale_factor
    pad = (k - 1) // 2
    padded = jnp.pad(features, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # Accumulate k*k shifted-feature FMAs at output resolution. The naive
    # unfold-then-einsum form materializes an (n, hs, ws, k*k, c) patch
    # tensor (a k*k x HBM blowup); this loop keeps every intermediate at
    # output size and XLA fuses each repeat+multiply+add into one kernel.
    out = jnp.zeros((n, h * s, w * s, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            src = padded[:, dy:dy + h, dx:dx + w, :]
            src = jnp.repeat(jnp.repeat(src, s, axis=1), s, axis=2)
            out = out + src.astype(jnp.float32) \
                * masks[..., dy * k + dx, None].astype(jnp.float32)
    return out.astype(features.dtype)


class CARAFEPack(Module):
    """Learned upsampler (ref: ops/carafe/carafe.py:132-240)."""

    def __init__(self, channels, scale_factor, up_kernel=5, up_group=1,
                 encoder_kernel=3, encoder_dilation=1,
                 compressed_channels=64):
        self.channels = channels
        self.scale_factor = scale_factor
        self.up_kernel = up_kernel
        self.channel_compressor = Conv2d(channels, compressed_channels, 1)
        self.content_encoder = Conv2d(
            compressed_channels,
            up_kernel * up_kernel * scale_factor * scale_factor,
            encoder_kernel, padding=int((encoder_kernel - 1) * encoder_dilation / 2),
            dilation=encoder_dilation, weight_init='normal', init_std=0.001)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'channel_compressor': self.channel_compressor.init(k1),
                'content_encoder': self.content_encoder.init(k2)}

    def __call__(self, params, x):
        n, h, w, c = x.shape
        s, k = self.scale_factor, self.up_kernel
        comp = self.channel_compressor(params['channel_compressor'], x)
        masks = self.content_encoder(params['content_encoder'], comp)
        # pixel-shuffle to (n, h*s, w*s, k*k) then softmax normalize
        # (ref kernel_normalizer, carafe.py:216)
        masks = masks.reshape(n, h, w, s, s, k * k)
        masks = masks.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h * s, w * s, k * k)
        masks = jax.nn.softmax(masks, axis=-1)
        return carafe(x, masks, k, 1, s)

"""Vendored timm utility layers, JAX edition.

Counterpart of the rest of the reference's vendored timm layer set
(mmdet/models/backbones/layers/: activations.py, adaptive_avgmax_pool.py,
anti_aliasing.py, blur_pool.py, cond_conv2d.py, conv2d_same.py,
conv_bn_act.py, drop.py, median_pool.py, mixed_conv2d.py, padding.py,
pool2d_same.py, space_to_depth.py, split_attn.py, split_batchnorm.py).
Only CbamModule is consumed by the reference's necks; these are provided
as working drop-in building blocks for the same experiments, rebuilt in
the package's functional module style (NHWC, pure init/__call__).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...layers import BatchNorm, Conv2d, ConvModule, Module, max_pool2d

# --------------------------------------------------------------- activations


def swish(x):
    return x * jax.nn.sigmoid(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def hard_sigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x):
    return x * hard_sigmoid(x)


def hard_mish(x):
    return 0.5 * x * jnp.clip(x + 2.0, 0.0, 2.0)


# ---------------------------------------------------------------- pooling


def adaptive_avgmax_pool2d(x, output_size=1):
    """0.5 * (avg + max) global/adaptive pool (timm adaptive_avgmax)."""
    from ...layers import adaptive_max_pool2d
    if output_size == 1:
        return 0.5 * (x.mean(axis=(1, 2), keepdims=True)
                      + x.max(axis=(1, 2), keepdims=True))
    amax = adaptive_max_pool2d(x, output_size)
    aavg = _adaptive_avg(x, output_size)
    return 0.5 * (amax + aavg)


def adaptive_catavgmax_pool2d(x, output_size=1):
    """Channel-concatenated avg/max pool (timm adaptive_catavgmax)."""
    from ...layers import adaptive_max_pool2d
    if output_size == 1:
        return jnp.concatenate([x.mean(axis=(1, 2), keepdims=True),
                                x.max(axis=(1, 2), keepdims=True)], -1)
    return jnp.concatenate([_adaptive_avg(x, output_size),
                            adaptive_max_pool2d(x, output_size)], -1)


def _adaptive_avg(x, output_size):
    oh, ow = (output_size, output_size) if isinstance(output_size, int) \
        else output_size
    n, h, w, c = x.shape
    assert h % oh == 0 and w % ow == 0, 'integer-ratio adaptive avg only'
    return x.reshape(n, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))


class SelectAdaptivePool2d(Module):
    """Pool selector (timm SelectAdaptivePool2d): 'avg' | 'max' |
    'avgmax' | 'catavgmax'."""

    def __init__(self, pool_type='avg', flatten=False):
        self.pool_type = pool_type
        self.flatten = flatten

    def init(self, key):
        return {}

    def __call__(self, params, x):
        if self.pool_type == 'avg':
            out = x.mean(axis=(1, 2), keepdims=True)
        elif self.pool_type == 'max':
            out = x.max(axis=(1, 2), keepdims=True)
        elif self.pool_type == 'avgmax':
            out = adaptive_avgmax_pool2d(x)
        elif self.pool_type == 'catavgmax':
            out = adaptive_catavgmax_pool2d(x)
        else:
            raise ValueError(self.pool_type)
        return out.reshape(x.shape[0], -1) if self.flatten else out


class MedianPool2d(Module):
    """Median filter pool (timm median_pool.py): median over each k x k
    window via sort on the unfolded patch axis."""

    def __init__(self, kernel_size=3, stride=1, padding=None):
        self.k = kernel_size
        self.stride = stride
        self.padding = kernel_size // 2 if padding is None else padding

    def init(self, key):
        return {}

    def __call__(self, params, x):
        k, s, p = self.k, self.stride, self.padding
        n, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        oh = (h + 2 * p - k) // s + 1
        ow = (w + 2 * p - k) // s + 1
        patches = jnp.stack(
            [xp[:, dy:dy + oh * s:s, dx:dx + ow * s:s, :]
             for dy in range(k) for dx in range(k)], axis=-1)
        return jnp.sort(patches, axis=-1)[..., (k * k) // 2]


# ------------------------------------------------------- blur / anti-alias


class BlurPool2d(Module):
    """Anti-aliased downsampling (timm blur_pool.py / anti_aliasing.py):
    fixed binomial filter as a depthwise stride-2 conv."""

    def __init__(self, channels, filt_size=3, stride=2):
        self.channels = channels
        self.stride = stride
        coeffs = np.poly1d([0.5, 0.5]) ** (filt_size - 1)
        filt1d = np.asarray(coeffs.coeffs, np.float32)
        self.filt = jnp.asarray(np.outer(filt1d, filt1d))
        self.filt_size = filt_size

    def init(self, key):
        return {}

    def __call__(self, params, x):
        k = self.filt_size
        pad = (k - 1) // 2
        w = jnp.broadcast_to(self.filt[:, :, None, None],
                             (k, k, 1, self.channels)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=self.channels)


# ---------------------------------------------------------------- dropout


def drop_path(x, key, drop_prob=0.0, training=True):
    """Stochastic depth (timm drop.py drop_path): zero whole samples and
    rescale survivors."""
    if not training or drop_prob == 0.0:
        return x
    keep = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape).astype(x.dtype)
    return x / keep * mask


class DropPath(Module):
    def __init__(self, drop_prob=0.0):
        self.drop_prob = drop_prob

    def init(self, key):
        return {}

    def __call__(self, params, x, key=None, training=False):
        if key is None or not training:
            return x
        return drop_path(x, key, self.drop_prob, training)


def drop_block_2d(x, key, drop_prob=0.1, block_size=7, training=True):
    """DropBlock (timm drop.py, simplified): contiguous block dropout via
    max-pooled Bernoulli seeds, with survivor rescaling."""
    if not training or drop_prob == 0.0:
        return x
    n, h, w, c = x.shape
    gamma = drop_prob * h * w / (block_size ** 2) / max(
        (h - block_size + 1) * (w - block_size + 1), 1)
    seeds = jax.random.bernoulli(key, gamma, (n, h, w, c)).astype(x.dtype)
    block = max_pool2d(seeds, block_size, stride=1,
                      padding=block_size // 2)
    mask = 1.0 - jnp.clip(block, 0.0, 1.0)
    denom = jnp.maximum(mask.mean(), 1e-6)
    return x * mask / denom


# ----------------------------------------------------------- same padding


def pad_same(x, kernel_size, stride, dilation=1):
    """TF-'SAME' asymmetric padding (timm padding.py / conv2d_same.py)."""
    ih, iw = x.shape[1], x.shape[2]
    kh = kw = kernel_size if isinstance(kernel_size, int) else None
    if kh is None:
        kh, kw = kernel_size
    sh = sw = stride if isinstance(stride, int) else None
    if sh is None:
        sh, sw = stride
    ph = max((math.ceil(ih / sh) - 1) * sh + (kh - 1) * dilation + 1 - ih, 0)
    pw = max((math.ceil(iw / sw) - 1) * sw + (kw - 1) * dilation + 1 - iw, 0)
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)))


class Conv2dSame(Conv2d):
    """Conv with TF-'SAME' padding (timm conv2d_same.py)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 **kw):
        kw.pop('padding', None)
        super().__init__(in_channels, out_channels, kernel_size,
                         stride=stride, padding=0, **kw)
        self._same_k = kernel_size
        self._same_s = stride

    def __call__(self, params, x):
        return super().__call__(
            params, pad_same(x, self._same_k, self._same_s))


class AvgPool2dSame(Module):
    def __init__(self, kernel_size, stride):
        self.k, self.s = kernel_size, stride

    def init(self, key):
        return {}

    def __call__(self, params, x):
        x = pad_same(x, self.k, self.s)
        n, h, w, c = x.shape
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, self.k, self.k, 1),
            (1, self.s, self.s, 1), 'VALID') / (self.k * self.k)


# ----------------------------------------------------------- conv variants


class ConvBnAct(ConvModule):
    """timm conv_bn_act.py — identical role to the package ConvModule."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, act='relu'):
        super().__init__(in_channels, out_channels, kernel_size,
                         stride=stride, padding=padding, dilation=dilation,
                         norm_cfg=dict(type='BN'), act_cfg=act)


class MixedConv2d(Module):
    """Mixed depthwise conv (timm mixed_conv2d.py): channel groups with
    different kernel sizes."""

    def __init__(self, in_channels, out_channels, kernel_sizes=(3, 5, 7),
                 stride=1, depthwise=False):
        n = len(kernel_sizes)
        in_splits = [in_channels // n + (1 if i < in_channels % n else 0)
                     for i in range(n)]
        out_splits = [out_channels // n + (1 if i < out_channels % n else 0)
                      for i in range(n)]
        self.in_splits = in_splits
        self.convs = [
            Conv2d(ci, co, k, stride=stride, padding=k // 2,
                   groups=ci if depthwise else 1)
            for ci, co, k in zip(in_splits, out_splits, kernel_sizes)]

    def init(self, key):
        keys = jax.random.split(key, len(self.convs))
        return {str(i): c.init(k) for i, (c, k)
                in enumerate(zip(self.convs, keys))}

    def __call__(self, params, x):
        outs = []
        off = 0
        for i, (c, ci) in enumerate(zip(self.convs, self.in_splits)):
            outs.append(c(params[str(i)], x[..., off:off + ci]))
            off += ci
        return jnp.concatenate(outs, -1)


class CondConv2d(Module):
    """Conditionally-parameterized conv (timm cond_conv2d.py): per-sample
    softmax-routed mixture of expert kernels, evaluated as a vmapped
    dense conv with the mixed kernel."""

    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=None, num_experts=4):
        self.num_experts = num_experts
        self.k = kernel_size
        self.stride = stride
        self.padding = kernel_size // 2 if padding is None else padding
        self.cin, self.cout = in_channels, out_channels
        self.routing = Conv2d(in_channels, num_experts, 1)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        fan_in = self.k * self.k * self.cin
        w = jax.random.normal(
            k1, (self.num_experts, self.k, self.k, self.cin, self.cout)) \
            * (2.0 / fan_in) ** 0.5
        return {'weight': w, 'routing': self.routing.init(k2)}

    def __call__(self, params, x):
        pooled = x.mean(axis=(1, 2), keepdims=True)
        route = jax.nn.sigmoid(
            self.routing(params['routing'], pooled))[:, 0, 0, :]  # (N, E)
        w = jnp.einsum('ne,ekhio->nkhio', route.astype(jnp.float32),
                       params['weight'].astype(jnp.float32))

        def one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi.astype(xi.dtype),
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding),
                         (self.padding, self.padding)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]

        return jax.vmap(one)(x, w)


# ------------------------------------------------------------- split attn


class SplitAttn(Module):
    """ResNeSt split attention (timm split_attn.py): radix-grouped
    softmax channel attention."""

    def __init__(self, channels, radix=2, reduction_factor=4):
        self.radix = radix
        self.channels = channels
        attn_ch = max(channels * radix // reduction_factor, 32)
        self.fc1 = Conv2d(channels, attn_ch, 1)
        self.bn1 = BatchNorm(attn_ch)
        self.fc2 = Conv2d(attn_ch, channels * radix, 1)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {'fc1': self.fc1.init(k1), 'bn1': self.bn1.init(k2),
                'fc2': self.fc2.init(k3)}

    def __call__(self, params, x):
        """x: (N, H, W, radix*C) radix-stacked features."""
        n, h, w, rc = x.shape
        r, c = self.radix, rc // self.radix
        xs = x.reshape(n, h, w, r, c)
        gap = xs.sum(axis=3).mean(axis=(1, 2), keepdims=True)
        a = jax.nn.relu(self.bn1(params['bn1'],
                                 self.fc1(params['fc1'], gap)))
        a = self.fc2(params['fc2'], a).reshape(n, 1, 1, r, c)
        a = jax.nn.softmax(a, axis=3) if r > 1 else jax.nn.sigmoid(a)
        return (xs * a).sum(axis=3)


class SplitBatchNorm2d(Module):
    """Aux-split BN (timm split_batchnorm.py): first 1/num_splits of the
    batch uses the main BN stats, the rest use aux BNs. At inference all
    samples use the main stats (matching timm eval behavior)."""

    def __init__(self, channels, num_splits=2):
        self.num_splits = num_splits
        self.bns = [BatchNorm(channels) for _ in range(num_splits)]

    def init(self, key):
        keys = jax.random.split(key, self.num_splits)
        p = self.bns[0].init(keys[0])
        p['aux_bn'] = {str(i): self.bns[i + 1].init(keys[i + 1])
                       for i in range(self.num_splits - 1)}
        return p

    def __call__(self, params, x):
        main = {k: v for k, v in params.items() if k != 'aux_bn'}
        return self.bns[0](main, x)


class SpaceToDepthModule(Module):
    """2x2 space-to-depth (timm space_to_depth.py; the same transform the
    backbone's stem_space_to_depth flag uses)."""

    def __init__(self, block_size=2):
        self.bs = block_size

    def init(self, key):
        return {}

    def __call__(self, params, x):
        b = self.bs
        n, h, w, c = x.shape
        x = x.reshape(n, h // b, b, w // b, b, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // b, w // b, b * b * c)

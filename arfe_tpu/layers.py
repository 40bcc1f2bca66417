"""Functional NHWC building blocks.

The model layer's design differs from the reference's ``nn.Module`` tree on
purpose: modules here are *static configuration* objects with pure
``init(key) -> params`` / ``__call__(params, x) -> y`` methods, and parameters
are nested dicts whose keys mirror the reference/PyTorch ``state_dict`` names
(e.g. ``backbone.layer1.0.conv1.weight``) so checkpoint conversion is a
mechanical name-preserving transpose. All compute is NHWC / HWIO — the
TPU-native layout.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


class Module:
    """Base class: static config + pure init/apply."""

    def init(self, key):
        raise NotImplementedError

    def __call__(self, params, *args, **kwargs):
        raise NotImplementedError


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


# ---------------------------------------------------------------------------
# initializers (numpy RNG via jax.random)
# ---------------------------------------------------------------------------

def kaiming_uniform(key, shape_hwio, a=math.sqrt(5)):
    """PyTorch Conv2d default init (kaiming_uniform with a=sqrt(5))."""
    kh, kw, cin, cout = shape_hwio
    fan_in = kh * kw * cin
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def normal_init(key, shape, std=0.01):
    return std * jax.random.normal(key, shape, jnp.float32)


def xavier_uniform(key, shape_hwio):
    kh, kw, cin, cout = shape_hwio
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)


def kaiming_normal_fan_out(key, shape_hwio):
    """mmcv kaiming_init(mode='fan_out', nonlinearity='relu')."""
    kh, kw, _, cout = shape_hwio
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape_hwio, jnp.float32)


_INITS = {
    'torch_default': kaiming_uniform,
    'normal': normal_init,
    'xavier': xavier_uniform,
    'kaiming_fan_out': kaiming_normal_fan_out,
}


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

class Conv2d(Module):
    """NHWC conv; weights HWIO (torch OIHW transposed (2,3,1,0))."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 weight_init='torch_default', init_std=0.01, bias_value=0.0):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.with_bias = bias
        self.weight_init = weight_init
        self.init_std = init_std
        self.bias_value = bias_value

    @property
    def weight_shape(self):
        kh, kw = self.kernel_size
        return (kh, kw, self.in_channels // self.groups, self.out_channels)

    def init(self, key):
        wkey, _ = jax.random.split(key)
        init_fn = _INITS[self.weight_init]
        if self.weight_init == 'normal':
            w = init_fn(wkey, self.weight_shape, std=self.init_std)
        else:
            w = init_fn(wkey, self.weight_shape)
        params = {'weight': w}
        if self.with_bias:
            params['bias'] = jnp.full((self.out_channels,), self.bias_value,
                                      jnp.float32)
        return params

    def __call__(self, params, x):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, params['weight'].shape, ('NHWC', 'HWIO', 'NHWC'))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, params['weight'].astype(x.dtype),
            window_strides=self.stride,
            padding=[(ph, ph), (pw, pw)],
            rhs_dilation=self.dilation,
            dimension_numbers=dn,
            feature_group_count=self.groups)
        if self.with_bias:
            y = y + params['bias'].astype(y.dtype)
        return y


class Linear(Module):
    """Dense layer; weight stored torch-style (out, in) for 1:1 conversion."""

    def __init__(self, in_features, out_features, bias=True,
                 weight_init='torch_default', init_std=0.01):
        self.in_features = in_features
        self.out_features = out_features
        self.with_bias = bias
        self.weight_init = weight_init
        self.init_std = init_std

    def init(self, key):
        if self.weight_init == 'normal':
            w = self.init_std * jax.random.normal(
                key, (self.out_features, self.in_features), jnp.float32)
        else:
            bound = math.sqrt(1.0 / self.in_features)
            w = jax.random.uniform(
                key, (self.out_features, self.in_features), jnp.float32,
                -bound, bound)
        params = {'weight': w}
        if self.with_bias:
            params['bias'] = jnp.zeros((self.out_features,), jnp.float32)
        return params

    def __call__(self, params, x):
        y = x @ params['weight'].astype(x.dtype).T
        if self.with_bias:
            y = y + params['bias'].astype(y.dtype)
        return y


class BatchNorm(Module):
    """BatchNorm in eval/frozen semantics: normalize with running stats.

    Matches the reference's dominant configuration (``norm_eval=True``,
    ref: configs ``norm_cfg=dict(type='BN')`` + backbone ``norm_eval=True``):
    running stats are never updated during detector training, so on TPU the
    layer is a pure affine transform. (Train-mode BN with cross-replica
    stats is provided separately for SSD-style models — see ``sync_stats``
    in train-mode batchnorm, to be used with a psum over the data axis.)
    """

    def __init__(self, num_features, eps=1e-5):
        self.num_features = num_features
        self.eps = eps

    def init(self, key):
        c = self.num_features
        return {
            'weight': jnp.ones((c,), jnp.float32),
            'bias': jnp.zeros((c,), jnp.float32),
            'running_mean': jnp.zeros((c,), jnp.float32),
            'running_var': jnp.ones((c,), jnp.float32),
        }

    def __call__(self, params, x):
        # running stats are buffers, not trainable (no grads flow to them)
        mean = jax.lax.stop_gradient(params['running_mean'])
        var = jax.lax.stop_gradient(params['running_var'])
        scale = params['weight'] * jax.lax.rsqrt(var + self.eps)
        offset = params['bias'] - mean * scale
        return x * scale.astype(x.dtype) + offset.astype(x.dtype)


class GroupNorm(Module):
    def __init__(self, num_groups, num_channels, eps=1e-5):
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps

    def init(self, key):
        c = self.num_channels
        return {'weight': jnp.ones((c,), jnp.float32),
                'bias': jnp.zeros((c,), jnp.float32)}

    def __call__(self, params, x):
        n, h, w, c = x.shape
        g = self.num_groups
        if c % g:
            raise ValueError(
                f'GroupNorm: channels ({c}) not divisible by num_groups '
                f'({g}) — pick feat_channels divisible by the GN group '
                'count (mmdet heads default to GN-32)')
        xg = x.reshape(n, h, w, g, c // g).astype(jnp.float32)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = xg.reshape(n, h, w, c).astype(x.dtype)
        return y * params['weight'].astype(x.dtype) \
            + params['bias'].astype(x.dtype)


def build_norm(norm_cfg, num_channels):
    """norm_cfg -> (norm module, state-dict child name).

    Mirrors mmcv build_norm_layer: BN -> BatchNorm (eval semantics),
    GN -> GroupNorm.
    """
    if norm_cfg is None:
        return None
    cfg = dict(norm_cfg)
    t = cfg.pop('type')
    cfg.pop('requires_grad', None)
    if t in ('BN', 'SyncBN'):
        return BatchNorm(num_channels, **cfg)
    if t == 'GN':
        return GroupNorm(cfg.pop('num_groups'), num_channels, **cfg)
    raise KeyError(f'Unsupported norm type {t}')


class ConvModule(Module):
    """conv (+ norm) (+ activation), mirroring mmcv ConvModule param naming:
    children ``conv``, ``bn``/``gn`` (ref uses ``bn`` for both)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, norm_cfg=None,
                 act_cfg='relu', bias='auto', weight_init='torch_default',
                 init_std=0.01, bias_value=0.0):
        self.with_norm = norm_cfg is not None
        if bias == 'auto':
            bias = not self.with_norm
        self.conv = Conv2d(in_channels, out_channels, kernel_size, stride,
                           padding, dilation, groups, bias,
                           weight_init=weight_init, init_std=init_std,
                           bias_value=bias_value)
        self.norm = build_norm(norm_cfg, out_channels)
        self.act = act_cfg

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = {'conv': self.conv.init(k1)}
        if self.with_norm:
            params['bn'] = self.norm.init(k2)
        return params

    def __call__(self, params, x):
        y = self.conv(params['conv'], x)
        if self.with_norm:
            y = self.norm(params['bn'], y)
        if self.act == 'relu':
            y = jax.nn.relu(y)
        elif self.act == 'sigmoid':
            y = jax.nn.sigmoid(y)
        elif self.act == 'tanh':
            y = jnp.tanh(y)
        elif self.act is not None:
            raise KeyError(f'Unsupported act {self.act}')
        return y


# ---------------------------------------------------------------------------
# functional ops
# ---------------------------------------------------------------------------

def max_pool2d(x, kernel_size, stride=None, padding=0):
    """NHWC max pool (torch semantics: pad with -inf)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    if kh == kw == 1 and ph == pw == 0:
        # kernel-1 "pool" (FPN P6 = max_pool2d(P5, 1, stride=2)) is a
        # strided subsample; the slice transposes to a cheap pad instead
        # of reduce_window's SelectAndScatter backward
        return x[:, ::sh, ::sw, :]
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16)
        else jnp.finfo(x.dtype).min,
        jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
        [(0, 0), (ph, ph), (pw, pw), (0, 0)])


def avg_pool2d(x, kernel_size, stride=None, padding=0):
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride if stride is not None else kernel_size)
    ph, pw = _pair(padding)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, sh, sw, 1),
        [(0, 0), (ph, ph), (pw, pw), (0, 0)])
    return summed / (kh * kw)


def adaptive_max_pool2d(x, output_size):
    """NHWC adaptive max pool (torch ``F.adaptive_max_pool2d`` semantics:
    cell i pools rows [floor(i*h/oh), ceil((i+1)*h/oh))). Fast reduce_window
    path for integer ratios, gather+mask otherwise."""
    n, h, w, c = x.shape
    oh, ow = _pair(output_size)
    if h % oh == 0 and w % ow == 0:
        return max_pool2d(x, (h // oh, w // ow))

    def pool_axis(arr, size, out, axis):
        starts = (np.arange(out) * size) // out
        ends = -(-(np.arange(out) + 1) * size // out)  # ceil
        kmax = int((ends - starts).max())
        idx = starts[:, None] + np.arange(kmax)[None, :]
        mask = idx < ends[:, None]
        idx = np.minimum(idx, size - 1)
        g = jnp.take(arr, jnp.asarray(idx.reshape(-1)), axis=axis)
        new_shape = arr.shape[:axis] + (out, kmax) + arr.shape[axis + 1:]
        g = g.reshape(new_shape)
        m = jnp.asarray(mask)
        m = m.reshape((1,) * axis + (out, kmax)
                      + (1,) * (arr.ndim - axis - 1))
        g = jnp.where(m, g, -jnp.inf)
        return g.max(axis=axis + 1)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


def adaptive_avg_pool2d(x, output_size):
    """NHWC adaptive average pool (torch semantics)."""
    n, h, w, c = x.shape
    oh, ow = _pair(output_size)
    if h % oh == 0 and w % ow == 0:
        return avg_pool2d(x, (h // oh, w // ow))

    def pool_axis(arr, size, out, axis):
        starts = (np.arange(out) * size) // out
        ends = -(-(np.arange(out) + 1) * size // out)
        kmax = int((ends - starts).max())
        idx = starts[:, None] + np.arange(kmax)[None, :]
        mask = (idx < ends[:, None]).astype(np.float32)
        idx = np.minimum(idx, size - 1)
        g = jnp.take(arr, jnp.asarray(idx.reshape(-1)), axis=axis)
        new_shape = arr.shape[:axis] + (out, kmax) + arr.shape[axis + 1:]
        g = g.reshape(new_shape)
        m = jnp.asarray(mask).reshape(
            (1,) * axis + (out, kmax) + (1,) * (arr.ndim - axis - 1))
        return (g * m).sum(axis=axis + 1) / m.sum(axis=axis + 1)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


def global_avg_pool(x, keepdims=False):
    return x.mean(axis=(1, 2), keepdims=keepdims)


def resize_nearest(x, size):
    """Nearest-neighbor resize to (h, w) — matches torch
    ``F.interpolate(mode='nearest')`` (source index = floor(dst * src /
    dst)). Integer up-scales lower to repeat (broadcast+reshape) and
    integer down-scales to strided slices: XLA's row gather runs at
    ~10-20% of HBM peak on v5e, and FPN top-down / AR-FPN attention
    resizes sit on the hot path, so the gather is a last resort."""
    n, h, w, c = x.shape
    th, tw = size

    def axis_resize(arr, src, dst, axis):
        if dst == src:
            return arr
        if dst % src == 0:
            return jnp.repeat(arr, dst // src, axis=axis)
        if src % dst == 0:
            f = src // dst
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(None, None, f)
            return arr[tuple(sl)]
        idx = (np.arange(dst) * src // dst).astype(np.int32)
        return jnp.take(arr, idx, axis=axis)

    x = axis_resize(x, h, th, 1)
    return axis_resize(x, w, tw, 2)


def upsample2x_nearest(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def resize_bilinear(x, size, align_corners=False):
    """Bilinear resize (torch F.interpolate semantics)."""
    n, h, w, c = x.shape
    th, tw = size
    if align_corners:
        ys = jnp.linspace(0., h - 1., th)
        xs = jnp.linspace(0., w - 1., tw)
    else:
        ys = (jnp.arange(th) + 0.5) * (h / th) - 0.5
        xs = (jnp.arange(tw) + 0.5) * (w / tw) - 0.5
        ys = jnp.clip(ys, 0., h - 1.)
        xs = jnp.clip(xs, 0., w - 1.)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    p00 = x[:, y0][:, :, x0]
    p01 = x[:, y0][:, :, x1]
    p10 = x[:, y1][:, :, x0]
    p11 = x[:, y1][:, :, x1]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def stop_gradient_tree(params):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


def take_rows(table, idx, per_row=False):
    """Row lookup ``table[idx]`` specialized for a SMALL first dim.

    XLA's TPU lowering of a per-element dynamic gather is pathologically
    slow at detection scales — measured 6.1 ms for 4x268k anchor indices
    into a 16-row gt-box table, vs 0.2 ms for 16 masked compare+FMA
    passes (pure VPU work, no gather unit). Every per-anchor/per-roi
    lookup into the padded gt tables should go through here. Requires
    finite table values (padded gt rows are zeros) and idx already
    clipped into range; falls back to the native gather when the table
    is big enough that the pass count would lose.

    With ``per_row=True``, ``table`` is (G, N, ...) and ``idx`` (N,):
    returns ``table[idx[n], n]`` per position n (e.g. the FCOS min-area
    gt pick).
    """
    g = table.shape[0]
    if g > 64:
        if per_row:
            exp = idx.reshape((1,) + idx.shape
                              + (1,) * (table.ndim - 1 - idx.ndim))
            exp = jnp.broadcast_to(exp, (1,) + table.shape[1:])
            return jnp.take_along_axis(table, exp, axis=0)[0]
        return table[idx]
    idx = idx.astype(jnp.int32)
    tail = table.shape[2:] if per_row else table.shape[1:]
    extra = (1,) * len(tail)
    acc = jnp.zeros(idx.shape + tail, table.dtype)
    for i in range(g):
        m = (idx == i).reshape(idx.shape + extra)
        acc = acc + m.astype(table.dtype) * table[i]
    return acc

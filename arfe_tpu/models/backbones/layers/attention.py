"""Vendored attention layers (counterpart of the reference's vendored timm
layer set, mmdet/models/backbones/layers/ — of which only CbamModule is
consumed, by necks/fpn_cbam.py; SE/ECA/selective-kernel are provided for
the same drop-in experiments).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# CBAM lives with the neck that consumes it; re-export from there
from ...necks.experimental_fpns import CbamModule
from ...layers import Conv2d, Module


class LightCbamModule(Module):
    """'Light' CBAM: summed avg+max pools (ref: layers/cbam.py:97-110)."""

    def __init__(self, channels, spatial_kernel_size=7, reduction=16):
        red = max(channels // reduction, 1)
        self.fc1 = Conv2d(channels, red, 1, bias=False)
        self.fc2 = Conv2d(red, channels, 1, bias=False)
        self.spatial = Conv2d(1, 1, spatial_kernel_size,
                              padding=spatial_kernel_size // 2)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {'channel': {'fc1': self.fc1.init(k1),
                            'fc2': self.fc2.init(k2)},
                'spatial': {'conv': self.spatial.init(k3)}}

    def __call__(self, params, x):
        cp = params['channel']
        pool = 0.5 * x.mean(axis=(1, 2), keepdims=True) \
            + 0.5 * x.max(axis=(1, 2), keepdims=True)
        attn = self.fc2(cp['fc2'], jax.nn.relu(self.fc1(cp['fc1'], pool)))
        x = x * jax.nn.sigmoid(attn)
        sp = 0.5 * x.mean(-1, keepdims=True) + 0.5 * x.max(-1, keepdims=True)
        return x * jax.nn.sigmoid(
            self.spatial(params['spatial']['conv'], sp))


class SEModule(Module):
    """Squeeze-and-excitation (ref: layers/se.py)."""

    def __init__(self, channels, reduction=16):
        red = max(channels // reduction, 1)
        self.fc1 = Conv2d(channels, red, 1)
        self.fc2 = Conv2d(red, channels, 1)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'fc1': self.fc1.init(k1), 'fc2': self.fc2.init(k2)}

    def __call__(self, params, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = self.fc2(params['fc2'],
                     jax.nn.relu(self.fc1(params['fc1'], s)))
        return x * jax.nn.sigmoid(s)


class EcaModule(Module):
    """Efficient channel attention: 1-D conv over pooled channels
    (ref: layers/eca.py)."""

    def __init__(self, channels, gamma=2, beta=1):
        t = int(abs(math.log(channels, 2) + beta) / gamma)
        self.k = max(t if t % 2 else t + 1, 3)
        self.channels = channels

    def init(self, key):
        bound = math.sqrt(1.0 / self.k)
        return {'conv': {'weight': jax.random.uniform(
            key, (self.k,), jnp.float32, -bound, bound)}}

    def __call__(self, params, x):
        s = x.mean(axis=(1, 2))                               # (B, C)
        w = params['conv']['weight']
        pad = self.k // 2
        s = jnp.pad(s, ((0, 0), (pad, pad)))
        out = sum(s[:, i:i + self.channels] * w[i] for i in range(self.k))
        return x * jax.nn.sigmoid(out)[:, None, None, :]


class SelectiveKernelAttn(Module):
    """Selective-kernel branch attention (ref: layers/selective_kernel.py):
    softmax over per-branch channel logits from a shared bottleneck."""

    def __init__(self, channels, num_paths=2, attn_channels=32):
        self.num_paths = num_paths
        self.fc_reduce = Conv2d(channels, attn_channels, 1, bias=False)
        self.fc_select = Conv2d(attn_channels, channels * num_paths, 1)
        self.channels = channels

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {'fc_reduce': self.fc_reduce.init(k1),
                'fc_select': self.fc_select.init(k2)}

    def __call__(self, params, xs):
        """xs: (B, P, H, W, C) branch features -> weighted sum (B,H,W,C)."""
        s = xs.sum(axis=1).mean(axis=(1, 2), keepdims=True)
        z = jax.nn.relu(self.fc_reduce(params['fc_reduce'], s))
        logits = self.fc_select(params['fc_select'], z)
        logits = logits.reshape(logits.shape[0], 1, 1, self.num_paths,
                                self.channels)
        attn = jax.nn.softmax(logits, axis=3)
        return (xs.transpose(0, 2, 3, 1, 4) * attn).sum(axis=3)

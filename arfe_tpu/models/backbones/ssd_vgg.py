"""SSD VGG-16 backbone with extra feature layers and L2Norm
(ref: mmdet/models/backbones/ssd_vgg.py). Param names mirror torch:
``features.{i}`` for the VGG stack, ``extra.{i}``, ``l2_norm``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import BACKBONES
from ..layers import Conv2d, Module, max_pool2d

# VGG16 layer config: channels per conv, 'M' = 2x2 maxpool,
# 'C' = ceil-mode maxpool
VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'C', 512, 512, 512,
             'M', 512, 512, 512]

EXTRA_CFG = {
    300: (256, 'S', 512, 128, 'S', 256, 128, 256, 128, 256),
    512: (256, 'S', 512, 128, 'S', 256, 128, 'S', 256, 128, 'S', 256, 128),
}


@BACKBONES.register_module()
class SSDVGG(Module):
    def __init__(self, input_size=300, depth=16, with_last_pool=False,
                 ceil_mode=True, out_indices=(3, 4),
                 out_feature_indices=(22, 34), l2_norm_scale=20.):
        assert input_size in (300, 512)
        assert depth == 16, 'only VGG16 is supported'
        self.input_size = input_size
        self.out_feature_indices = tuple(out_feature_indices)
        self.l2_norm_scale = l2_norm_scale
        # build the torch-indexed module list: conv,(relu) and pools count
        self.features = []   # list of ('conv', Conv2d) | ('pool', cfg)
        in_ch = 3
        for v in VGG16_CFG:
            if v == 'M':
                self.features.append(('pool', dict(ceil=False)))
                self.features.append(None)  # placeholder to keep torch idx
            elif v == 'C':
                self.features.append(('pool', dict(ceil=True)))
                self.features.append(None)
            else:
                self.features.append(
                    ('conv', Conv2d(in_ch, v, 3, padding=1)))
                self.features.append(('relu', None))
                in_ch = v
        # pool5 (3x3, s1, p1) + fc6 dilated + fc7 (ref ssd_vgg.py)
        self.features.append(('pool5', None))
        self.fc6 = Conv2d(512, 1024, 3, padding=6, dilation=6)
        self.fc7 = Conv2d(1024, 1024, 1)
        # extras
        self.extras = []
        cfg = EXTRA_CFG[input_size]
        in_ch = 1024
        i = 0
        while i < len(cfg):
            if cfg[i] == 'S':
                i += 1
                continue
            k = 1 if len(self.extras) % 2 == 0 else 3
            stride = 2 if i + 1 < len(cfg) and cfg[i - 1] == 'S' else 1
            pad = 1 if (k == 3 and stride == 2) else 0
            self.extras.append(Conv2d(in_ch, cfg[i], k, stride=stride,
                                      padding=pad))
            in_ch = cfg[i]
            i += 1

    def init(self, key):
        keys = iter(jax.random.split(key, 64))
        p = {'features': {}}
        for i, item in enumerate(self.features):
            if item and item[0] == 'conv':
                p['features'][str(i)] = item[1].init(next(keys))
        p['fc6'] = self.fc6.init(next(keys))
        p['fc7'] = self.fc7.init(next(keys))
        p['extra'] = {str(i): m.init(next(keys))
                      for i, m in enumerate(self.extras)}
        p['l2_norm'] = {'weight': jnp.full((512,), self.l2_norm_scale)}
        return p

    def __call__(self, params, x):
        outs = []
        conv43 = None
        torch_idx = 0
        i = 0
        while i < len(self.features):
            item = self.features[i]
            if item is None:
                i += 1
                continue
            kind = item[0]
            if kind == 'conv':
                x = item[1](params['features'][str(i)], x)
            elif kind == 'relu':
                x = jax.nn.relu(x)
                if i == 21:  # after conv4_3 relu (torch idx 22 boundary)
                    conv43 = x
            elif kind == 'pool':
                ceil = item[1]['ceil']
                if ceil and x.shape[1] % 2 == 1:
                    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                                constant_values=-jnp.inf)
                x = max_pool2d(x, 2, 2)
            elif kind == 'pool5':
                x = max_pool2d(x, 3, stride=1, padding=1)
            i += 1
        x = jax.nn.relu(self.fc6(params['fc6'], x))
        x = jax.nn.relu(self.fc7(params['fc7'], x))
        # L2Norm on conv4_3
        norm = jnp.sqrt((conv43.astype(jnp.float32) ** 2).sum(
            -1, keepdims=True)) + 1e-10
        c43 = (conv43 / norm) * params['l2_norm']['weight']
        outs.append(c43.astype(x.dtype))
        outs.append(x)
        for j, m in enumerate(self.extras):
            x = jax.nn.relu(m(params['extra'][str(j)], x))
            if j % 2 == 1:
                outs.append(x)
        return tuple(outs)

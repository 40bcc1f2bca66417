"""Recursive Feature Pyramid detector (DetectoRS)
(ref: mmdet/models/detectors/rfp.py:10-110 + rfp_forward hooks in
backbones/resnet.py:96,334,676).

extract_feat runs backbone+neck, then for each extra rfp step feeds
ASPP-transformed pyramid levels back into (a copy of) the backbone via the
blocks' zero-init rfp convs and fuses old/new pyramids with a learned
sigmoid gate.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...registry import DETECTORS
from ..builder import build_backbone
from ..layers import Conv2d, Module
from .two_stage import CascadeRCNN


class ASPP(Module):
    """(ref: rfp.py:10-44): parallel dilated 1/3/3/1 convs; the last branch
    sees the globally pooled input and is broadcast back."""

    def __init__(self, in_channels, out_channels):
        specs = [(1, 1, 0), (3, 3, 3), (3, 6, 6), (1, 1, 0)]
        self.convs = [Conv2d(in_channels, out_channels, k, dilation=d,
                             padding=p, bias=True,
                             weight_init='kaiming_fan_out')
                      for k, d, p in specs]

    def init(self, key):
        keys = jax.random.split(key, len(self.convs))
        return {'aspp': {str(i): m.init(k)
                         for i, (m, k) in enumerate(zip(self.convs, keys))}}

    def __call__(self, params, x):
        gap = x.mean(axis=(1, 2), keepdims=True)
        outs = []
        for i, m in enumerate(self.convs):
            inp = gap if i == len(self.convs) - 1 else x
            outs.append(jax.nn.relu(m(params['aspp'][str(i)], inp)))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, -1)


@DETECTORS.register_module()
class RecursiveFeaturePyramid(CascadeRCNN):
    def __init__(self, backbone, rfp_steps=2, rfp_sharing=False,
                 stage_with_rfp=(False, True, True, True), **kwargs):
        self.rfp_steps = rfp_steps
        self.rfp_sharing = rfp_sharing
        self.stage_with_rfp = stage_with_rfp
        backbone = dict(backbone)
        backbone['rfp'] = None
        backbone['stage_with_rfp'] = stage_with_rfp
        neck = kwargs['neck']
        neck_out = (neck[0] if isinstance(neck, (list, tuple))
                    else neck)['out_channels']
        if rfp_sharing:
            backbone['rfp'] = neck_out
        super().__init__(backbone, **kwargs)
        if not rfp_sharing:
            backbone['rfp'] = neck_out
            self.rfp_modules = [build_backbone(backbone)
                                for _ in range(1, rfp_steps)]
        self.rfp_aspp = ASPP(neck_out, neck_out // 4)
        self.rfp_weight = Conv2d(neck_out, 1, 1, bias=True)

    def init(self, key):
        k0, k1, k2, k3 = jax.random.split(key, 4)
        p = super().init(k0)
        if not self.rfp_sharing:
            keys = jax.random.split(k1, max(len(self.rfp_modules), 1))
            p['rfp_modules'] = {str(i): m.init(keys[i])
                                for i, m in enumerate(self.rfp_modules)}
        p['rfp_aspp'] = self.rfp_aspp.init(k2)
        # zero-init gate (ref: rfp.py:83-84)
        p['rfp_weight'] = jax.tree_util.tree_map(
            jnp.zeros_like, self.rfp_weight.init(k3))
        return p

    def extract_feat(self, params, img):
        """(ref: rfp.py:86-110)."""
        x = self.backbone(params['backbone'], img)
        x = self.neck(params['neck'], x)
        for step in range(self.rfp_steps - 1):
            rfp_feats = tuple(
                self.rfp_aspp(params['rfp_aspp'], x[i])
                if self.stage_with_rfp[i] else x[i]
                for i in range(len(self.stage_with_rfp)))
            if self.rfp_sharing:
                x_idx = self.backbone.rfp_forward(params['backbone'], img,
                                                  rfp_feats)
            else:
                x_idx = self.rfp_modules[step].rfp_forward(
                    params['rfp_modules'][str(step)], img, rfp_feats)
            x_idx = self.neck(params['neck'], x_idx)
            x_new = []
            for i in range(len(x_idx)):
                w = jax.nn.sigmoid(self.rfp_weight(params['rfp_weight'],
                                                   x_idx[i]))
                x_new.append(w * x_idx[i] + (1 - w) * x[i])
            x = tuple(x_new)
        return x

"""Model builders (ref: mmdet/models/builder.py:13-40).

A list-valued neck config builds a sequential chain, matching the reference's
``nn.Sequential`` composition of [FPN, WFPNDualSpatial]
(ref: builder.py:13-20).
"""
from __future__ import annotations

import jax

from ..registry import (BACKBONES, DETECTORS, HEADS, NECKS, ROI_EXTRACTORS,
                        SHARED_HEADS, build_from_cfg)
from .layers import Module


class NeckSequence(Module):
    """Sequential necks; params keyed '0', '1', ... like torch Sequential."""

    def __init__(self, necks):
        self.necks = necks

    def init(self, key):
        keys = jax.random.split(key, len(self.necks))
        return {str(i): n.init(keys[i]) for i, n in enumerate(self.necks)}

    def __call__(self, params, x):
        for i, n in enumerate(self.necks):
            x = n(params[str(i)], x)
        return x


def build_backbone(cfg):
    return build_from_cfg(cfg, BACKBONES)


def build_neck(cfg):
    if isinstance(cfg, (list, tuple)):
        return NeckSequence([build_from_cfg(c, NECKS) for c in cfg])
    return build_from_cfg(cfg, NECKS)


def build_head(cfg, **default_args):
    return build_from_cfg(cfg, HEADS, default_args or None)


def build_roi_extractor(cfg):
    return build_from_cfg(cfg, ROI_EXTRACTORS)


def build_shared_head(cfg):
    return build_from_cfg(cfg, SHARED_HEADS)


def build_detector(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(cfg, DETECTORS,
                          dict(train_cfg=train_cfg, test_cfg=test_cfg))

"""Multi-level fused semantic head for HTC (ref:
mmdet/models/roi_heads/mask_heads/fused_semantic_head.py:10-107).

All pyramid levels are 1x1-conv'd and fused (align-corners bilinear, as the
reference) at ``fusion_level`` resolution, then 4 3x3 convs produce the
semantic feature map; two 1x1 heads emit the segmentation logits and the
embedding consumed by the bbox/mask branches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS
from ...layers import Conv2d, ConvModule, Module


def _resize_bilinear_align_corners(x, size):
    """NHWC align_corners=True bilinear resize (torch F.interpolate
    semantics used by the reference)."""
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x

    def axis_coords(out_len, in_len):
        if out_len == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out_len, dtype=jnp.float32) \
            * (in_len - 1) / (out_len - 1)

    ys = axis_coords(oh, h)
    xs = axis_coords(ow, w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


@HEADS.register_module()
class FusedSemanticHead(Module):
    def __init__(self, num_ins, fusion_level, num_convs=4, in_channels=256,
                 conv_out_channels=256, num_classes=183, ignore_label=255,
                 loss_weight=0.2, conv_cfg=None, norm_cfg=None):
        self.num_ins = num_ins
        self.fusion_level = fusion_level
        self.num_convs = num_convs
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.loss_weight = loss_weight
        self.lateral_convs = [
            ConvModule(in_channels, in_channels, 1, norm_cfg=norm_cfg,
                       act_cfg='relu')
            for _ in range(num_ins)
        ]
        self.convs = [
            ConvModule(in_channels if i == 0 else conv_out_channels,
                       conv_out_channels, 3, padding=1, norm_cfg=norm_cfg,
                       act_cfg='relu')
            for i in range(num_convs)
        ]
        self.conv_embedding = ConvModule(conv_out_channels,
                                         conv_out_channels, 1,
                                         norm_cfg=norm_cfg, act_cfg='relu')
        self.conv_logits = Conv2d(conv_out_channels, num_classes, 1,
                                  weight_init='kaiming_fan_out')

    def init(self, key):
        keys = jax.random.split(key, self.num_ins + self.num_convs + 2)
        return {
            'lateral_convs': {str(i): m.init(keys[i])
                              for i, m in enumerate(self.lateral_convs)},
            'convs': {str(i): m.init(keys[self.num_ins + i])
                      for i, m in enumerate(self.convs)},
            'conv_embedding': self.conv_embedding.init(keys[-2]),
            'conv_logits': self.conv_logits.init(keys[-1]),
        }

    def __call__(self, params, feats):
        """feats: pyramid levels (NHWC). Returns (seg logits, embedding)."""
        x = self.lateral_convs[self.fusion_level](
            params['lateral_convs'][str(self.fusion_level)],
            feats[self.fusion_level])
        size = x.shape[1:3]
        for i, feat in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            lat = self.lateral_convs[i](params['lateral_convs'][str(i)],
                                        feat)
            x = x + _resize_bilinear_align_corners(lat, size)
        for i, m in enumerate(self.convs):
            x = m(params['convs'][str(i)], x)
        mask_pred = self.conv_logits(params['conv_logits'], x)
        return mask_pred, self.conv_embedding(params['conv_embedding'], x)

    def loss(self, mask_pred, labels):
        """Pixel CE with ignore_label (ref :101-107). labels: (B, H, W)
        int."""
        logp = jax.nn.log_softmax(mask_pred.astype(jnp.float32), axis=-1)
        labels = labels.astype(jnp.int32)
        valid = labels != self.ignore_label
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        ce = jnp.where(valid, ce, 0.0)
        return self.loss_weight * ce.sum() \
            / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)

"""FCN mask head (ref:
mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:20-250): 4 convs +
2x deconv + 1x1 class-wise mask logits. Param names mirror the reference:
``convs.{i}.conv``, ``upsample``, ``conv_logits``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS, LOSSES, build_from_cfg
from ...layers import Conv2d, ConvModule, Module


class ConvTranspose2d(Module):
    """2x deconv via nearest upsample-free transposed conv (matches torch
    ConvTranspose2d(k=2, s=2) exactly through lax.conv_transpose)."""

    def __init__(self, in_channels, out_channels, kernel_size=2, stride=2):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride

    def init(self, key):
        import math
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        bound = math.sqrt(1.0 / fan_in)
        # stored torch-layout (in, out, kh, kw) transposed to HWOI? We keep
        # HWIO of the equivalent forward conv: (k, k, in, out)
        w = jax.random.uniform(key, (k, k, self.in_channels,
                                     self.out_channels), jnp.float32,
                               -bound, bound)
        return {'weight': w,
                'bias': jnp.zeros((self.out_channels,), jnp.float32)}

    def __call__(self, params, x):
        y = jax.lax.conv_transpose(
            x, params['weight'].astype(x.dtype),
            strides=(self.stride, self.stride), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + params['bias'].astype(y.dtype)


@HEADS.register_module()
class FCNMaskHead(Module):
    def __init__(self, num_convs=4, roi_feat_size=14, in_channels=256,
                 conv_kernel_size=3, conv_out_channels=256,
                 num_classes=80, class_agnostic=False, upsample_cfg=None,
                 conv_cfg=None, norm_cfg=None, loss_mask=None):
        self.num_convs = num_convs
        self.in_channels = in_channels
        self.conv_out_channels = conv_out_channels
        self.num_classes = num_classes
        self.class_agnostic = class_agnostic
        upsample_cfg = upsample_cfg or dict(type='deconv', scale_factor=2)
        self.upsample_method = upsample_cfg.get('type', 'deconv')
        self.convs = []
        for i in range(num_convs):
            in_ch = in_channels if i == 0 else conv_out_channels
            self.convs.append(ConvModule(
                in_ch, conv_out_channels, conv_kernel_size,
                padding=(conv_kernel_size - 1) // 2, norm_cfg=norm_cfg,
                act_cfg='relu', weight_init='kaiming_fan_out'))
        # with num_convs=0 (the C4 schema) the upsample reads the raw
        # shared-head features (ref: fcn_mask_head.py upsample_in_channels)
        upsample_in = conv_out_channels if num_convs > 0 else in_channels
        if self.upsample_method == 'deconv':
            self.upsample = ConvTranspose2d(upsample_in,
                                            conv_out_channels, 2, 2)
            logits_in = conv_out_channels
        else:
            logits_in = upsample_in
        out_ch = 1 if class_agnostic else num_classes
        self.conv_logits = Conv2d(logits_in, out_ch, 1,
                                  weight_init='normal', init_std=0.001)
        self.loss_mask = build_from_cfg(
            loss_mask or dict(type='CrossEntropyLoss', use_mask=True,
                              loss_weight=1.0), LOSSES)

    def init(self, key):
        keys = jax.random.split(key, self.num_convs + 2)
        p = {'convs': {str(i): m.init(keys[i])
                       for i, m in enumerate(self.convs)},
             'conv_logits': self.conv_logits.init(keys[-1])}
        if self.upsample_method == 'deconv':
            p['upsample'] = self.upsample.init(keys[-2])
        return p

    def __call__(self, params, x):
        """x: (R, 14, 14, C) -> (R, 28, 28, num_classes) logits."""
        for i, m in enumerate(self.convs):
            x = m(params['convs'][str(i)], x)
        if self.upsample_method == 'deconv':
            x = jax.nn.relu(self.upsample(params['upsample'], x))
        return self.conv_logits(params['conv_logits'], x)

    def loss(self, mask_pred, mask_targets, labels, pos_mask):
        """Per-roi BCE on the matched class channel
        (ref: fcn_mask_head.py:110-127 + mask_cross_entropy).

        Args:
            mask_pred: (S, m, m, C) logits for all sampled rois.
            mask_targets: (S, m, m) binary targets.
            labels: (S,) class of each sampled roi.
            pos_mask: (S,) which rois contribute (positives).
        """
        if self.class_agnostic:
            sel = mask_pred[..., 0]
        else:
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_pred, safe[:, None, None, None], axis=-1)[..., 0]
        bce = jnp.maximum(sel, 0) - sel * mask_targets + \
            jnp.log1p(jnp.exp(-jnp.abs(sel)))
        per_roi = bce.mean(axis=(1, 2))
        w = pos_mask.astype(per_roi.dtype)
        return dict(loss_mask=self.loss_mask.loss_weight
                    * (per_roi * w).sum() / jnp.maximum(w.sum(), 1.0))

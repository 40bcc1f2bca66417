"""Mask IoU head (ref:
mmdet/models/roi_heads/mask_heads/maskiou_head.py:13-187): predicts the IoU
between each predicted mask and its gt, used by Mask Scoring R-CNN to
calibrate mask scores. Param names mirror the reference: ``convs.{i}``,
``fcs.{i}``, ``fc_mask_iou``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS, LOSSES, build_from_cfg
from ...layers import Conv2d, Linear, Module, max_pool2d


@HEADS.register_module()
class MaskIoUHead(Module):
    def __init__(self, num_convs=4, num_fcs=2, roi_feat_size=14,
                 in_channels=256, conv_out_channels=256,
                 fc_out_channels=1024, num_classes=80, loss_iou=None):
        self.num_classes = num_classes
        self.convs = []
        for i in range(num_convs):
            cin = in_channels + 1 if i == 0 else conv_out_channels
            stride = 2 if i == num_convs - 1 else 1
            self.convs.append(Conv2d(cin, conv_out_channels, 3,
                                     stride=stride, padding=1,
                                     weight_init='kaiming_fan_out'))
        pooled = (roi_feat_size // 2) * (roi_feat_size // 2)
        self.fcs = []
        for i in range(num_fcs):
            cin = conv_out_channels * pooled if i == 0 else fc_out_channels
            self.fcs.append(Linear(cin, fc_out_channels))
        self.fc_mask_iou = Linear(fc_out_channels, num_classes,
                                  weight_init='normal', init_std=0.01)
        self.loss_iou = build_from_cfg(
            loss_iou or dict(type='MSELoss', loss_weight=0.5), LOSSES)

    def init(self, key):
        keys = jax.random.split(key, len(self.convs) + len(self.fcs) + 1)
        return {
            'convs': {str(i): m.init(keys[i])
                      for i, m in enumerate(self.convs)},
            'fcs': {str(i): m.init(keys[len(self.convs) + i])
                    for i, m in enumerate(self.fcs)},
            'fc_mask_iou': self.fc_mask_iou.init(keys[-1]),
        }

    def __call__(self, params, mask_feat, mask_pred):
        """mask_feat: (R, h, w, C); mask_pred: (R, 2h, 2w) logits of the
        predicted class (ref :77-90)."""
        prob = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
        pooled = max_pool2d(prob[..., None], 2, 2)
        x = jnp.concatenate([mask_feat.astype(jnp.float32), pooled], axis=-1)
        for i, m in enumerate(self.convs):
            x = jax.nn.relu(m(params['convs'][str(i)], x))
        from ..bbox_heads.bbox_head import _flatten_nchw
        x = _flatten_nchw(x)
        for i, m in enumerate(self.fcs):
            x = jax.nn.relu(m(params['fcs'][str(i)], x))
        return self.fc_mask_iou(params['fc_mask_iou'], x)

    def loss(self, mask_iou_pred, mask_iou_targets, valid):
        """MSE over samples with target > 0 (ref :92-100)."""
        sel = valid & (mask_iou_targets > 0)
        w = sel.astype(jnp.float32)
        return dict(loss_mask_iou=self.loss_iou(
            mask_iou_pred, mask_iou_targets, weight=w,
            avg_factor=jnp.maximum(w.sum(), 1.0)))

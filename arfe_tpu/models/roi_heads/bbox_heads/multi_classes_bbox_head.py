"""Multi-class auxiliary bbox head ("+fac").

TPU-native counterpart of ref:
mmdet/models/roi_heads/bbox_heads/multi_classes_bbox_head.py:14-300:
a ConvFC bbox head that additionally predicts image-level class presence
from channel+spatial-attention-pooled RoI features, returning
``(cls_score, bbox_pred, multi_cls)``; its loss adds ``loss_multi_cls``
(the presence hinge, losses/cross_entropy_loss.py multi_classes_loss).

Design note: the reference pools ``mean_mat`` over ALL rois in the (single
GPU) batch (ref :223-224); here pooling is per image (composable with any
batch size — SURVEY.md §0 recommends building the mechanisms composably).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....registry import HEADS, LOSSES, build_from_cfg
from ...layers import ConvModule, Linear
from .bbox_head import ConvFCBBoxHead


@HEADS.register_module()
class MultiClassesBBoxHead(ConvFCBBoxHead):
    with_multi_cls = True

    def __init__(self, loss_multi_cls=None, *args, **kwargs):
        loss_multi_cls = loss_multi_cls or dict(
            type='CrossEntropyLoss', use_multi_cls=True, loss_weight=1.0)
        self.loss_multi_cls = build_from_cfg(loss_multi_cls, LOSSES)
        super().__init__(*args, **kwargs)

    def _init_layers(self):
        c = self.in_channels
        # channel+spatial attention and presence projection
        # (ref: multi_classes_bbox_head.py:101-117)
        self.spa_conv = ConvModule(c, 1, 3, padding=1,
                                   norm_cfg=self.norm_cfg, act_cfg='relu',
                                   weight_init='xavier')
        self.refine_conv = ConvModule(c, c, 1, norm_cfg=self.norm_cfg,
                                      act_cfg='relu', weight_init='xavier')
        self.pre_fc = Linear(self.roi_feat_area * c, 256,
                             weight_init='xavier')
        self.multi_cls_reg = Linear(256, (self.num_classes + 1) * 2,
                                    weight_init='xavier')
        super()._init_layers()

    def init(self, key):
        keys = jax.random.split(key, 5)
        p = super().init(keys[4])
        p['spa_conv'] = self.spa_conv.init(keys[0])
        p['refine_conv'] = self.refine_conv.init(keys[1])
        p['pre_fc'] = self.pre_fc.init(keys[2])
        p['multi_cls_reg'] = self.multi_cls_reg.init(keys[3])
        return p

    def __call__(self, params, x, num_imgs=1):
        """x: (R, h, w, C) with R divisible by num_imgs.

        Returns (cls_score (R, C+1), bbox_pred (R, 4k),
        multi_cls (num_imgs, C+1, 2)).
        """
        # channel attention (ref :170-172)
        cha_att = jax.nn.relu(x.mean(axis=(1, 2), keepdims=True))
        x_mc = x + x * cha_att
        # spatial attention (ref :173-174)
        spa_att = self.spa_conv(params['spa_conv'], x_mc)
        mean_mat = x + x * spa_att
        final_feat = self.refine_conv(params['refine_conv'], mean_mat)

        cls_score, bbox_pred = super().__call__(params, final_feat)

        # image-level presence from roi-pooled attention features
        # (ref :223-225), per image
        r, hh, ww, cc = mean_mat.shape
        # flatten CHW (torch order) so converted pre_fc weights line up
        per_img = mean_mat.reshape(num_imgs, r // num_imgs, hh, ww, cc) \
            .mean(axis=1).transpose(0, 3, 1, 2).reshape(num_imgs, -1)
        fc1 = jax.nn.relu(self.pre_fc(params['pre_fc'], per_img))
        multi_cls = self.multi_cls_reg(params['multi_cls_reg'], fc1)
        multi_cls = multi_cls.reshape(num_imgs, self.num_classes + 1, 2)
        return cls_score, bbox_pred, multi_cls

    def loss(self, cls_score, bbox_pred, labels, label_weights, bbox_targets,
             bbox_weights, multi_cls=None, presence=None, **extra):
        """(ref: multi_classes_bbox_head.py:231-284). ``presence``:
        (num_imgs, C+1) multi-hot of classes among the image's sampled rois
        (includes the bg index, matching the reference's ori[labels]=1)."""
        losses = super().loss(cls_score, bbox_pred, labels, label_weights,
                              bbox_targets, bbox_weights)
        if multi_cls is not None and presence is not None:
            per_img = jax.vmap(self.loss_multi_cls)(multi_cls, presence)
            losses['loss_multi_cls'] = per_img.mean()
        return losses


@HEADS.register_module()
class Shared2FCMultiClassesBBoxHead(MultiClassesBBoxHead):
    """(ref: multi_classes_bbox_head.py:287-300)."""

    def __init__(self, fc_out_channels=1024, *args, **kwargs):
        super().__init__(num_shared_convs=0, num_shared_fcs=2,
                         num_cls_convs=0, num_cls_fcs=0, num_reg_convs=0,
                         num_reg_fcs=0, fc_out_channels=fc_out_channels,
                         *args, **kwargs)

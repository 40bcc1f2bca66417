"""RetinaNet head with per-level BN, shared convs
(ref: mmdet/models/dense_heads/retina_sepbn_head.py:8-96).

Conv weights are shared across FPN levels; norm statistics/affine params are
per level. Params store the shared conv once under ``cls_convs.0.{i}.conv``
(the reference's torch state_dict duplicates the shared tensor at every
level; the converter keeps level 0) and per-level norms under
``cls_convs.{lvl}.{i}.bn``.
"""
from __future__ import annotations

import math

import jax

from ...registry import HEADS
from ..layers import Conv2d, ConvModule
from .anchor_head import AnchorHead


@HEADS.register_module()
class RetinaSepBNHead(AnchorHead):
    def __init__(self, num_classes, num_ins, in_channels, stacked_convs=4,
                 conv_cfg=None, norm_cfg=None, **kwargs):
        self.stacked_convs = stacked_convs
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg
        self.num_ins = num_ins
        super().__init__(num_classes, in_channels, **kwargs)

    def _init_layers(self):
        self.cls_convs = []
        self.reg_convs = []
        for i in range(self.stacked_convs):
            chn = self.in_channels if i == 0 else self.feat_channels
            self.cls_convs.append(ConvModule(
                chn, self.feat_channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
            self.reg_convs.append(ConvModule(
                chn, self.feat_channels, 3, padding=1,
                norm_cfg=self.norm_cfg, act_cfg='relu',
                weight_init='normal', init_std=0.01))
        bias_cls = -math.log((1 - 0.01) / 0.01)
        self.retina_cls = Conv2d(
            self.feat_channels, self.num_anchors * self.cls_out_channels, 3,
            padding=1, weight_init='normal', init_std=0.01,
            bias_value=bias_cls)
        self.retina_reg = Conv2d(self.feat_channels, self.num_anchors * 4, 3,
                                 padding=1, weight_init='normal',
                                 init_std=0.01)

    def init(self, key):
        keys = jax.random.split(key, 2 * self.stacked_convs *
                                (self.num_ins + 1) + 2)
        it = iter(keys)
        cls_p, reg_p = {}, {}
        for lvl in range(self.num_ins):
            cls_lvl, reg_lvl = {}, {}
            for i, (cm, rm) in enumerate(zip(self.cls_convs, self.reg_convs)):
                cp = cm.init(next(it))
                rp = rm.init(next(it))
                if lvl > 0:  # conv shared with level 0; keep only the norm
                    cp.pop('conv', None)
                    rp.pop('conv', None)
                cls_lvl[str(i)] = cp
                reg_lvl[str(i)] = rp
            cls_p[str(lvl)] = cls_lvl
            reg_p[str(lvl)] = reg_lvl
        return {'cls_convs': cls_p, 'reg_convs': reg_p,
                'retina_cls': self.retina_cls.init(next(it)),
                'retina_reg': self.retina_reg.init(next(it))}

    def _branch(self, modules, params, lvl, x):
        feat = x
        for i, m in enumerate(modules):
            p = dict(params[str(lvl)][str(i)])
            p['conv'] = params['0'][str(i)]['conv']
            feat = m(p, feat)
        return feat

    def __call__(self, params, feats):
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_feat, reg_feat = self.forward_features(params, x, lvl)
            cls_scores.append(self.retina_cls(params['retina_cls'], cls_feat))
            bbox_preds.append(self.retina_reg(params['retina_reg'], reg_feat))
        return tuple(cls_scores), tuple(bbox_preds)

    # channel-major inference (see AnchorHead.get_bboxes_feats): the towers
    # differ per level only in norm params; the finals are shared convs
    cm_finals = True

    def forward_features(self, params, x, lvl):
        cls_feat = self._branch(self.cls_convs, params['cls_convs'], lvl, x)
        reg_feat = self._branch(self.reg_convs, params['reg_convs'], lvl, x)
        return cls_feat, reg_feat

    def final_params(self, params, lvl):
        return params['retina_cls'], params['retina_reg']

"""AR-RFF bbox heads: fuse multi-scale RoI features.

TPU-native counterpart of ref:
mmdet/models/roi_heads/bbox_heads/multirois_bbox_head.py:11-240
(MultiBBoxHead / MultiRoIsBBoxHead) — consumes 3xC-channel concatenated RoI
features (original + width-stretched + height-stretched, from
``get_adaptive_scale_rois``), fuses via conv branches + elementwise
product/residual (``ori + ori*(conv(lwh)+conv(lhh))`` -> 3x3 conv), then the
standard shared-FC cls/reg branches. Channel order is [ori, lw, lh] matching
ref standard_roi_head.py:137-157.
"""
from __future__ import annotations

import jax

from ....registry import HEADS
from ...layers import ConvModule
from .bbox_head import ConvFCBBoxHead


@HEADS.register_module()
class MultiBBoxHead(ConvFCBBoxHead):
    def __init__(self, num_shared_convs=0, num_shared_fcs=2, num_ws_convs=2,
                 num_ws_fcs=2, *args, **kwargs):
        self.num_ws_convs = num_ws_convs
        self.num_ws_fcs = num_ws_fcs
        super().__init__(num_shared_convs=num_shared_convs,
                         num_shared_fcs=num_shared_fcs, *args, **kwargs)

    # how many C-channel roi feature groups this head consumes
    num_roi_groups = 3

    def _init_layers(self):
        c = self.in_channels
        self.hh_conv = ConvModule(c, c, 3, padding=1,
                                  norm_cfg=self.norm_cfg, act_cfg='relu',
                                  weight_init='xavier')
        self.wh_conv = ConvModule(c, c, 3, padding=1,
                                  norm_cfg=self.norm_cfg, act_cfg='relu',
                                  weight_init='xavier')
        self.final_conv = ConvModule(c, c, 3, padding=1,
                                     norm_cfg=self.norm_cfg, act_cfg='relu',
                                     weight_init='xavier')
        super()._init_layers()

    def init(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        p = super().init(k4)
        p['hh_conv'] = self.hh_conv.init(k1)
        p['wh_conv'] = self.wh_conv.init(k2)
        p['final_conv'] = self.final_conv.init(k3)
        return p

    def fuse(self, params, x):
        """(R, h, w, 3C) -> (R, h, w, C) fused
        (ref: multirois_bbox_head.py:165-185)."""
        c = self.in_channels
        ori = x[..., :c]
        lwh = x[..., c:2 * c]
        lhh = x[..., 2 * c:]
        lwh = self.wh_conv(params['wh_conv'], lwh)
        lhh = self.hh_conv(params['hh_conv'], lhh)
        ori_feats = ori * (lwh + lhh)
        return self.final_conv(params['final_conv'], ori + ori_feats)

    def __call__(self, params, x):
        fused = self.fuse(params, x)
        return super().__call__(params, fused)


@HEADS.register_module()
class MultiRoIsBBoxHead(MultiBBoxHead):
    """Config-name alias used by the flagship ARFE config
    (ref: configs/mytrain/faster_rcnn_r50_drfpn_drrff+fac_1x_coco.py:52)."""

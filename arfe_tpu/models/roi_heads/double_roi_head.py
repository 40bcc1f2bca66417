"""Double-Head R-CNN RoI head (ref:
mmdet/models/roi_heads/double_roi_head.py:5-32): separate RoI features for
the classification branch (plain) and the regression branch (extracted at
``reg_roi_scale_factor``-rescaled boxes).
"""
from __future__ import annotations

from ...registry import HEADS
from .standard_roi_head import StandardRoIHead


@HEADS.register_module()
class DoubleHeadRoIHead(StandardRoIHead):
    def __init__(self, reg_roi_scale_factor, **kwargs):
        self.reg_roi_scale_factor = reg_roi_scale_factor
        super().__init__(**kwargs)

    def _bbox_forward(self, params, feats, rois, num_imgs=1, **extract_kw):
        extractor = self.bbox_roi_extractor
        lvl_feats = feats[:extractor.num_inputs]
        cls_feats = extractor({}, lvl_feats, rois)
        reg_feats = extractor({}, lvl_feats, rois,
                              roi_scale_factor=self.reg_roi_scale_factor)
        cls_score, bbox_pred = self.bbox_head(params['bbox_head'], cls_feats,
                                              reg_feats)
        return cls_score, bbox_pred, cls_feats

"""Single-level RoI extractor (ref:
mmdet/models/roi_heads/roi_extractors/single_level.py:10-153).

Level routing is one packed-table gather (see ops/roi_align.py) instead of
the reference's per-level boolean indexing. Supports the reference's extended
arguments: ``roi_scale_factor``, ``lvl`` (shift assigned levels) and
``replace_rois`` (compute levels from substitute boxes) — used by the AR-RFF
multi-RoI heads (ref: single_level.py:109-152).
"""
from __future__ import annotations

import jax.numpy as jnp

from ....ops.roi_align import map_roi_levels, roi_align_pyramid
from ....registry import ROI_EXTRACTORS
from ...layers import Module


@ROI_EXTRACTORS.register_module()
class SingleRoIExtractor(Module):
    def __init__(self, roi_layer, out_channels, featmap_strides,
                 finest_scale=56):
        cfg = dict(roi_layer)
        layer_type = cfg.pop('type')
        assert layer_type in ('RoIAlign',), \
            f'unsupported roi layer {layer_type}'
        out_size = cfg.pop('out_size', 7)
        self.out_size = (out_size, out_size) if isinstance(out_size, int) \
            else tuple(out_size)
        self.sample_num = cfg.pop('sample_num', 0)
        self.aligned = cfg.pop('aligned', True)
        self.out_channels = out_channels
        self.featmap_strides = list(featmap_strides)
        self.finest_scale = finest_scale

    @property
    def num_inputs(self):
        return len(self.featmap_strides)

    def init(self, key):
        return {}

    def roi_rescale(self, rois, scale_factor):
        """Scale roi w/h around center (ref: single_level.py:101-113)."""
        cx = (rois[:, 1] + rois[:, 3]) * 0.5
        cy = (rois[:, 2] + rois[:, 4]) * 0.5
        w = (rois[:, 3] - rois[:, 1]) * scale_factor
        h = (rois[:, 4] - rois[:, 2]) * scale_factor
        return jnp.stack([rois[:, 0], cx - w * 0.5, cy - h * 0.5,
                          cx + w * 0.5, cy + h * 0.5], axis=-1)

    def __call__(self, params, feats, rois, roi_scale_factor=None, lvl=None,
                 replace_rois=None):
        num_levels = self.num_inputs
        lvl_src = replace_rois if replace_rois is not None else rois
        target_lvls = map_roi_levels(lvl_src, num_levels, self.finest_scale)
        if lvl is not None:
            target_lvls = jnp.clip(target_lvls + lvl, 0, num_levels - 1)
        if roi_scale_factor is not None:
            rois = self.roi_rescale(rois, roi_scale_factor)
        # Pallas window-DMA kernel when supported (4.4x the XLA gather on
        # v5e); level overrides AND roi_scale_factor fall back to the jnp
        # path since the fused entry recomputes levels internally from the
        # (possibly rescaled) rois, while the reference assigns levels from
        # the original boxes
        from ....ops.pallas_roi_align import pallas_supported, \
            roi_align_auto
        if (lvl is None and replace_rois is None and roi_scale_factor is None
                and pallas_supported(self.out_size, self.sample_num,
                                     num_levels, self.out_channels)):
            return roi_align_auto(
                tuple(feats[:num_levels]), rois, self.out_size,
                tuple(self.featmap_strides), self.finest_scale,
                self.sample_num, self.aligned)
        return roi_align_pyramid(
            list(feats), rois, self.out_size, self.featmap_strides,
            self.finest_scale, self.sample_num, self.aligned,
            target_lvls=target_lvls)

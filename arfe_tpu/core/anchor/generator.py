"""Anchor generation (numpy — anchors are compile-time constants).

TPU-native counterpart of ref: mmdet/core/anchor/anchor_generator.py:10-283.
Feature-map sizes are static under jit, so anchors are generated host-side
with numpy once per (config, image-shape) and baked into the compiled program
as constants — no device compute, no trace-time dynamism.
"""
from __future__ import annotations

import numpy as np

from ...registry import ANCHOR_GENERATORS


def _pair(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Standard 2D anchor generator (ref: anchor_generator.py:10-283).

    Matches reference semantics: base sizes default to strides, octave
    scales ``octave_base_scale * 2**(i/scales_per_octave)``, ratio applied as
    ``h *= sqrt(ratio), w /= sqrt(ratio)``, scale-major ordering, centers at
    ``center_offset * base_size`` (0 by default in v2).
    """

    def __init__(self, strides, ratios, scales=None, base_sizes=None,
                 scale_major=True, octave_base_scale=None,
                 scales_per_octave=None, centers=None, center_offset=0.):
        if center_offset != 0:
            assert centers is None
        assert 0 <= center_offset <= 1
        self.strides = [_pair(s) for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        assert len(self.base_sizes) == len(self.strides)
        assert ((octave_base_scale is not None
                 and scales_per_octave is not None) ^ (scales is not None))
        if scales is not None:
            self.scales = np.array(scales, dtype=np.float32)
        else:
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        self.octave_base_scale = octave_base_scale
        self.scales_per_octave = scales_per_octave
        self.ratios = np.array(ratios, dtype=np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self):
        return [ba.shape[0] for ba in self.base_anchors]

    @property
    def num_levels(self):
        return len(self.strides)

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(self.gen_single_level_base_anchors(
                base_size, self.scales, self.ratios, center))
        return out

    def gen_single_level_base_anchors(self, base_size, scales, ratios,
                                      center=None):
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * w
            y_center = self.center_offset * h
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([x_center - 0.5 * ws, y_center - 0.5 * hs,
                         x_center + 0.5 * ws, y_center + 0.5 * hs],
                        axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_sizes):
        """All anchors per level: list of (H*W*A, 4) float32 arrays, anchors
        of one grid cell contiguous (ref: anchor_generator.py:174-230)."""
        assert self.num_levels == len(featmap_sizes)
        return [
            self.single_level_grid_anchors(self.base_anchors[i],
                                           featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def single_level_grid_anchors(self, base_anchors, featmap_size,
                                  stride=(16, 16)):
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride[1]
        shift_xx = np.tile(shift_x, len(shift_y))
        shift_yy = np.repeat(shift_y, len(shift_x))
        shifts = np.stack([shift_xx, shift_yy, shift_xx, shift_yy], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4).astype(np.float32)

    def valid_flags(self, featmap_sizes, pad_shape):
        """Per-level bool flags for anchors whose grid cell lies inside the
        (unpadded-content of the) padded image
        (ref: anchor_generator.py:232-283)."""
        assert self.num_levels == len(featmap_sizes)
        flags = []
        for i in range(self.num_levels):
            # stride convention is (w, h), matching single_level_grid_anchors
            # which multiplies shift_x by stride[0]
            sw, sh = self.strides[i]
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape[0], pad_shape[1]
            valid_h = min(int(np.ceil(h / sh)), feat_h)
            valid_w = min(int(np.ceil(w / sw)), feat_w)
            vx = np.zeros(feat_w, dtype=bool)
            vy = np.zeros(feat_h, dtype=bool)
            vx[:valid_w] = True
            vy[:valid_h] = True
            valid = np.tile(vx, feat_h) & np.repeat(vy, feat_w)
            flags.append(np.repeat(valid, self.num_base_anchors[i]))
        return flags


@ANCHOR_GENERATORS.register_module()
class LegacyAnchorGenerator(AnchorGenerator):
    """mmdet v1.x anchor convention (ref: anchor_generator.py:402-470):
    integer-rounded sizes and center offset 0.5."""

    def gen_single_level_base_anchors(self, base_size, scales, ratios,
                                      center=None):
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * (w - 1)
            y_center = self.center_offset * (h - 1)
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        ws = np.round(ws)
        hs = np.round(hs)
        return np.stack([x_center - 0.5 * (ws - 1), y_center - 0.5 * (hs - 1),
                         x_center + 0.5 * (ws - 1), y_center + 0.5 * (hs - 1)],
                        axis=-1).astype(np.float32)


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchor generator (ref: anchor_generator.py:285-400)."""

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size=300, scale_major=True):
        self.strides = [_pair(s) for s in strides]
        self.input_size = input_size
        self.centers = [(s[0] / 2., s[1] / 2.) for s in self.strides]
        self.basesize_ratio_range = basesize_ratio_range
        min_ratio, max_ratio = basesize_ratio_range
        min_ratio, max_ratio = int(min_ratio * 100), int(max_ratio * 100)
        step = int(np.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(int(min_ratio), int(max_ratio) + 1, step):
            min_sizes.append(int(input_size * ratio / 100))
            max_sizes.append(int(input_size * (ratio + step) / 100))
        if input_size == 300:
            if basesize_ratio_range[0] == 0.15:
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
            elif basesize_ratio_range[0] == 0.2:
                min_sizes.insert(0, int(input_size * 10 / 100))
                max_sizes.insert(0, int(input_size * 20 / 100))
        elif input_size == 512:
            if basesize_ratio_range[0] == 0.1:
                min_sizes.insert(0, int(input_size * 4 / 100))
                max_sizes.insert(0, int(input_size * 10 / 100))
            elif basesize_ratio_range[0] == 0.15:
                min_sizes.insert(0, int(input_size * 7 / 100))
                max_sizes.insert(0, int(input_size * 15 / 100))
        anchor_ratios = []
        anchor_scales = []
        for k in range(len(self.strides)):
            scales = [1., np.sqrt(max_sizes[k] / min_sizes[k])]
            anchor_ratio = [1.]
            for r in ratios[k]:
                anchor_ratio += [1 / r, r]
            anchor_ratios.append(np.array(anchor_ratio, dtype=np.float32))
            anchor_scales.append(np.array(scales, dtype=np.float32))
        self.base_sizes = min_sizes
        self.scales_list = anchor_scales
        self.ratios_list = anchor_ratios
        self.scale_major = scale_major
        self.center_offset = 0.
        self.base_anchors = self.gen_base_anchors()

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            base_anchors = self.gen_single_level_base_anchors(
                base_size, self.scales_list[i], self.ratios_list[i],
                self.centers[i])
            # With scale_major=False rows are scale-major (scale outer,
            # ratio inner): row s*R+r. Reference keeps [1:1@min, 1:1@sqrt,
            # ratios@min] via index_select([0, R, 1..R-1])
            # (ref: anchor_generator.py:372-385).
            num_ratios = len(self.ratios_list[i])
            indices = list(range(num_ratios))
            indices.insert(1, num_ratios)
            out.append(base_anchors[np.array(indices)])
        return out


class PointGenerator:
    """Grid point generator for anchor-free heads
    (ref: mmdet/core/anchor/point_generator.py)."""

    def grid_points(self, featmap_size, stride=16):
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0., feat_w) * stride
        shift_y = np.arange(0., feat_h) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        strides = np.full_like(xx, stride)
        return np.stack([xx, yy, strides], axis=-1).astype(np.float32)

    def valid_flags(self, featmap_size, valid_size):
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        vx = np.zeros(feat_w, dtype=bool)
        vy = np.zeros(feat_h, dtype=bool)
        vx[:valid_w] = True
        vy[:valid_h] = True
        return np.tile(vx, feat_h) & np.repeat(vy, feat_w)

"""BBox coders (jnp).

TPU-native counterpart of ref:
mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:48-173 (DeltaXYWH) and
mmdet/core/bbox/coder/tblr_bbox_coder.py (TBLR). Numerics match the reference
formulas exactly (fp32).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...registry import BBOX_CODERS


def bbox2delta(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)):
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals
    (ref: delta_xywh_bbox_coder.py:48-94)."""
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    # Padded proposals can have zero w/h; keep the math finite (targets for
    # invalid rows are masked out downstream).
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape=None, wh_ratio_clip=16 / 1000):
    """Decode (dx, dy, dw, dh) deltas on top of rois
    (ref: delta_xywh_bbox_coder.py:96-173).

    Args:
        rois: (..., n, 4)
        deltas: (..., n, 4 * k) — k boxes per roi (class-wise regression).
        max_shape: optional (H, W) clamp.
    Returns:
        (..., n, 4 * k) boxes.
    """
    k = deltas.shape[-1] // 4
    d = deltas.reshape(deltas.shape[:-1] + (k, 4))
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    d = d * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(deltas.shape)


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    """Delta (dx, dy, dw, dh) box coder
    (ref: delta_xywh_bbox_coder.py:9-46)."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return delta2bbox(bboxes, pred_bboxes, self.means, self.stds,
                          max_shape, wh_ratio_clip)


@BBOX_CODERS.register_module()
class PseudoBBoxCoder:
    """Identity coder (ref: mmdet/core/bbox/coder/pseudo_bbox_coder.py)."""

    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred_bboxes, **kwargs):
        return pred_bboxes


@BBOX_CODERS.register_module()
class TBLRBBoxCoder:
    """Top/bottom/left/right coder normalized by anchor diagonal
    (ref: mmdet/core/bbox/coder/tblr_bbox_coder.py; used by FSAF)."""

    def __init__(self, normalizer=4.0):
        self.normalizer = normalizer

    def encode(self, bboxes, gt_bboxes):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        t = py - gt_bboxes[..., 1]
        b = gt_bboxes[..., 3] - py
        l = px - gt_bboxes[..., 0]
        r = gt_bboxes[..., 2] - px
        loc = jnp.stack([t, b, l, r], axis=-1)
        wh = jnp.stack([h, h, w, w], axis=-1)
        return loc / (jnp.maximum(wh, 1e-6) * self.normalizer)

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        px = (bboxes[..., 0] + bboxes[..., 2]) * 0.5
        py = (bboxes[..., 1] + bboxes[..., 3]) * 0.5
        w = bboxes[..., 2] - bboxes[..., 0]
        h = bboxes[..., 3] - bboxes[..., 1]
        loc = pred_bboxes * self.normalizer * jnp.stack(
            [h, h, w, w], axis=-1)
        t, b, l, r = loc[..., 0], loc[..., 1], loc[..., 2], loc[..., 3]
        out = jnp.stack([px - l, py - t, px + r, py + b], axis=-1)
        if max_shape is not None:
            out = jnp.stack([
                jnp.clip(out[..., 0], 0, max_shape[1]),
                jnp.clip(out[..., 1], 0, max_shape[0]),
                jnp.clip(out[..., 2], 0, max_shape[1]),
                jnp.clip(out[..., 3], 0, max_shape[0]),
            ], axis=-1)
        return out


def legacy_bbox2delta(proposals, gt, means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.)):
    """mmdet-1.x delta encoding: +1 width/height convention
    (ref: core/bbox/coder/legacy_delta_xywh_bbox_coder.py
    legacy_bbox2delta)."""
    proposals = proposals.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    dx = (gx - px) / jnp.maximum(pw, 1e-6)
    dy = (gy - py) / jnp.maximum(ph, 1e-6)
    dw = jnp.log(jnp.maximum(gw, 1e-6) / jnp.maximum(pw, 1e-6))
    dh = jnp.log(jnp.maximum(gh, 1e-6) / jnp.maximum(ph, 1e-6))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def legacy_delta2bbox(rois, deltas, means=(0., 0., 0., 0.),
                      stds=(1., 1., 1., 1.), max_shape=None,
                      wh_ratio_clip=16 / 1000):
    """mmdet-1.x delta decoding (ref: legacy_delta_xywh_bbox_coder.py
    legacy_delta2bbox, incl. the intentionally-dropped +-0.5)."""
    shape = deltas.shape
    deltas4 = deltas.reshape(shape[:-1] + (-1, 4)).astype(jnp.float32)
    means = jnp.asarray(means, jnp.float32)
    stds = jnp.asarray(stds, jnp.float32)
    d = deltas4 * stds + means
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shape)


@BBOX_CODERS.register_module()
class LegacyDeltaXYWHBBoxCoder:
    """(ref: core/bbox/coder/legacy_delta_xywh_bbox_coder.py:9-52) for
    models trained with mmdet 1.x."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return legacy_bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return legacy_delta2bbox(bboxes, pred_bboxes, self.means, self.stds,
                                 max_shape, wh_ratio_clip)

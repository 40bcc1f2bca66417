"""Mask target computation.

TPU-native counterpart of ref: mmdet/core/mask/mask_target.py. The
reference rasterizes gt masks per sampled RoI on CPU (dynamic shapes); here
gt masks arrive as fixed-size per-gt crops (see
structures.BitmapMasks.to_fixed_crops) and the per-RoI target is a
static-shape bilinear resample on device.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mask_target_from_crops(gt_crops, gt_boxes, rois, mask_size=28):
    """Resample fixed gt-mask crops to RoI-aligned targets.

    Args:
        gt_crops: (S, cs, cs) float mask crops, one per sampled roi's
            matched gt (already gathered).
        gt_boxes: (S, 4) the matched gt boxes (image coords).
        rois: (S, 4) sampled proposal boxes (image coords).
        mask_size: output resolution (ref FCNMaskHead 28).
    Returns:
        (S, mask_size, mask_size) float targets in [0, 1].
    """
    s, cs, _ = gt_crops.shape
    gx1, gy1 = gt_boxes[:, 0], gt_boxes[:, 1]
    gw = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 1e-2)
    gh = jnp.maximum(gt_boxes[:, 3] - gt_boxes[:, 1], 1e-2)
    rx1, ry1 = rois[:, 0], rois[:, 1]
    rw = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-2)
    rh = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-2)

    # sample centers of the roi's mask grid, mapped into crop coords
    grid = (jnp.arange(mask_size, dtype=jnp.float32) + 0.5) / mask_size
    xs = rx1[:, None] + grid[None, :] * rw[:, None]           # (S, m)
    ys = ry1[:, None] + grid[None, :] * rh[:, None]
    u = (xs - gx1[:, None]) / gw[:, None] * cs - 0.5           # crop coords
    v = (ys - gy1[:, None]) / gh[:, None] * cs - 0.5

    def sample_axis(coord):
        c = jnp.clip(coord, 0.0, cs - 1.0)
        i0 = jnp.floor(c).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, cs - 1)
        w1 = c - i0
        inside = (coord > -1.0) & (coord < cs)
        return i0, i1, 1.0 - w1, w1, inside

    vx0, vx1, wx0, wx1, in_x = sample_axis(u)
    vy0, vy1, wy0, wy1, in_y = sample_axis(v)

    bidx = jnp.arange(s)[:, None, None]
    m00 = gt_crops[bidx, vy0[:, :, None], vx0[:, None, :]]
    m01 = gt_crops[bidx, vy0[:, :, None], vx1[:, None, :]]
    m10 = gt_crops[bidx, vy1[:, :, None], vx0[:, None, :]]
    m11 = gt_crops[bidx, vy1[:, :, None], vx1[:, None, :]]
    out = (m00 * (wy0[:, :, None] * wx0[:, None, :])
           + m01 * (wy0[:, :, None] * wx1[:, None, :])
           + m10 * (wy1[:, :, None] * wx0[:, None, :])
           + m11 * (wy1[:, :, None] * wx1[:, None, :]))
    valid = in_y[:, :, None] & in_x[:, None, :]
    out = jnp.where(valid, out, 0.0)
    return (out >= 0.5).astype(jnp.float32)


def paste_masks_np(mask_pred, det_bboxes, img_h, img_w, thr=0.5):
    """Paste per-box mask_size x mask_size sigmoid masks into the full image
    (host numpy; ref: fcn_mask_head.py:149-250 get_seg_masks)."""
    import cv2
    n = mask_pred.shape[0]
    out = np.zeros((n, img_h, img_w), dtype=np.uint8)
    for i in range(n):
        x1, y1, x2, y2 = det_bboxes[i, :4]
        w = max(int(np.round(x2 - x1)), 1)
        h = max(int(np.round(y2 - y1)), 1)
        x1i = int(np.round(x1))
        y1i = int(np.round(y1))
        mask = cv2.resize(mask_pred[i].astype(np.float32), (w, h))
        mask = (mask > thr).astype(np.uint8)
        xs = slice(max(x1i, 0), min(x1i + w, img_w))
        ys = slice(max(y1i, 0), min(y1i + h, img_h))
        mxs = slice(max(-x1i, 0), max(-x1i, 0) + (xs.stop - xs.start))
        mys = slice(max(-y1i, 0), max(-y1i, 0) + (ys.stop - ys.start))
        if xs.stop > xs.start and ys.stop > ys.start:
            out[i, ys, xs] = mask[mys, mxs]
    return out

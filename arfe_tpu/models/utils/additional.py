"""Auxiliary RoI generation for AR-RFF (jnp).

TPU-native counterpart of ref: mmdet/models/utils/additional.py:1-222.
All functions take (R, 5) rois [batch, x1, y1, x2, y2] and return scaled
variants with the reference's exact arithmetic (the +1 width/height, the 0.1
floor clamp on the top-left).
"""
from __future__ import annotations

import jax.numpy as jnp


def _parts(rois):
    ctr_x = (rois[:, 1] + rois[:, 3]) * 0.5
    ctr_y = (rois[:, 2] + rois[:, 4]) * 0.5
    rw = rois[:, 3] - rois[:, 1] + 1.0
    rh = rois[:, 4] - rois[:, 2] + 1.0
    return ctr_x, ctr_y, rw, rh


def _make(rois, x1, y1, x2, y2):
    return jnp.stack([rois[:, 0], jnp.maximum(x1, 0.1),
                      jnp.maximum(y1, 0.1), x2, y2], axis=-1)


def get_large_small_rois(rois, large_rate=2.0, small_rate=0.5):
    """2x-enlarged and 0.5x-shrunk rois (ref: additional.py:4-35)."""
    cx, cy, rw, rh = _parts(rois)
    lw, lh = rw * large_rate, rh * large_rate
    sw, sh = rw * small_rate, rh * small_rate
    large = _make(rois, cx - lw * .5, cy - lh * .5, cx + lw * .5,
                  cy + lh * .5)
    small = _make(rois, cx - sw * .5, cy - sh * .5, cx + sw * .5,
                  cy + sh * .5)
    return large, small


def get_adaptive_scale_rois(rois, facs):
    """Aspect-ratio-dependent stretched rois (ref: additional.py:38-71):
    h_rate = (w/h)*fac + 1, w_rate = (h/w)*fac + 1. Returns
    (height-stretched, width-and-height-stretched) — note the reference's
    final state stretches BOTH axes of the second roi (:66-69)."""
    cx, cy, rw, rh = _parts(rois)
    h_rate = (rw / rh) * facs + 1.0
    w_rate = (rh / rw) * facs + 1.0
    lh = rh * h_rate
    lw = rw * w_rate
    adaptive_h = _make(rois, cx - rw * .5, cy - lh * .5, cx + rw * .5,
                       cy + lh * .5)
    adaptive_w = _make(rois, cx - lw * .5, cy - lh * .5, cx + lw * .5,
                       cy + lh * .5)
    return adaptive_h, adaptive_w


def get_large_wh_rois(rois, large_rate=3.0):
    """3x-elongated rois along each axis (ref: additional.py:74-102)."""
    cx, cy, rw, rh = _parts(rois)
    lw, lh = rw * large_rate, rh * large_rate
    large_w = _make(rois, cx - lw * .5, cy - rh * .5, cx + lw * .5,
                    cy + rh * .5)
    large_h = _make(rois, cx - rw * .5, cy - lh * .5, cx + rw * .5,
                    cy + lh * .5)
    return large_w, large_h


def get_small_wh_rois(rois, small_rate=0.33):
    """Axis-shrunk rois (ref: additional.py:104-138; note the reference uses
    lw_h for small_h_rois' y1 — reproduced)."""
    cx, cy, rw, rh = _parts(rois)
    lw_w, lw_h = rw, rh * small_rate
    lh_w, lh_h = rw * small_rate, rh
    small_w = _make(rois, cx - lw_w * .5, cy - lw_h * .5, cx + lw_w * .5,
                    cy + lw_h * .5)
    small_h = _make(rois, cx - lh_w * .5, cy - lw_h * .5, cx + lh_w * .5,
                    cy + lh_h * .5)
    return small_w, small_h


def get_boundary_rois(rois, small_rate=0.5):
    """Four boundary strips centered on each edge (ref:
    additional.py:141-184). Returns (top, right, bottom, left)."""
    cx, cy, rw, rh = _parts(rois)
    sw, sh = rw * small_rate, rh * small_rate
    x1, y1, x2, y2 = rois[:, 1], rois[:, 2], rois[:, 3], rois[:, 4]
    top = _make(rois, cx - sw, y1 - sh * .5, cx + sw, y1 + sh * .5)
    bottom = _make(rois, cx - sw, y2 - sh * .5, cx + sw, y2 + sh * .5)
    left = _make(rois, x1 - sw * .5, cy - sh, x1 + sw * .5, cy + sh)
    right = _make(rois, x2 - sw * .5, cy - sh, x2 + sw * .5, cy + sh)
    return top, right, bottom, left


def get_context_rois(rois):
    """Aspect-capped context rois (ref: additional.py:187-222)."""
    cx, cy, rw, rh = _parts(rois)
    wdh = jnp.minimum(rw / rh, 2.0)
    hdw = jnp.minimum(rh / rw, 2.0)
    h1_rate = jnp.where(rh < rw, wdh, 0.0) + 1.0
    w1_rate = jnp.where(rh < rw, 0.0, hdw) + 1.0
    h2_rate = wdh + 1.0
    w2_rate = hdw + 1.0
    ctx_h = _make(rois, cx - rw * w1_rate * .5, cy - rh * h1_rate * .5,
                  cx + rw * w1_rate * .5, cy + rh * h1_rate * .5)
    ctx_w = _make(rois, cx - rw * w2_rate * .5, cy - rh * h2_rate * .5,
                  cx + rw * w2_rate * .5, cy + rh * h2_rate * .5)
    return ctx_h, ctx_w

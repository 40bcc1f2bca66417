"""IoU-based regression losses
(ref: mmdet/models/losses/iou_loss.py, incl. ARFE's AIoULoss :256-290)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...core.bbox.iou import bbox_overlaps
from ...registry import LOSSES
from .utils import weight_reduce_loss


def iou_loss(pred, target, eps=1e-6):
    ious = jnp.clip(bbox_overlaps(pred, target, is_aligned=True), eps, None)
    return -jnp.log(ious)


def giou_loss(pred, target, eps=1e-7):
    ious = bbox_overlaps(pred, target, is_aligned=True)
    lt = jnp.minimum(pred[..., :2], target[..., :2])
    rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    enclose = wh[..., 0] * wh[..., 1] + eps
    area_p = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    area_t = (target[..., 2] - target[..., 0]) \
        * (target[..., 3] - target[..., 1])
    inter_lt = jnp.maximum(pred[..., :2], target[..., :2])
    inter_rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0, None)
    union = area_p + area_t - inter_wh[..., 0] * inter_wh[..., 1] + eps
    gious = ious - (enclose - union) / enclose
    return 1 - gious


def bounded_iou_loss(pred, target, beta=0.2, eps=1e-3):
    """(ref: iou_loss.py bounded_iou_loss — Improving Localization)."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0]
    ph = pred[..., 3] - pred[..., 1]
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    dx = tx - px
    dy = ty - py
    loss_dx = 1 - jnp.maximum((tw - 2 * jnp.abs(dx)) /
                              (tw + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum((th - 2 * jnp.abs(dy)) /
                              (th + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    loss_comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    return jnp.where(loss_comb < beta, 0.5 * loss_comb * loss_comb / beta,
                     loss_comb - 0.5 * beta)


def aiou_loss(pred, target, eps=1e-7):
    """ARFE aspect-aware IoU loss (ref: iou_loss.py:119-142)."""
    ious = bbox_overlaps(pred, target, is_aligned=True)
    w_pre = jnp.abs(pred[..., 2] - pred[..., 0])
    h_pre = jnp.abs(pred[..., 3] - pred[..., 1])
    w_tar = jnp.abs(target[..., 2] - target[..., 0])
    h_tar = jnp.abs(target[..., 3] - target[..., 1])
    w_ratio = jnp.minimum(w_pre, w_tar) / (jnp.maximum(w_pre, w_tar) + eps)
    h_ratio = jnp.minimum(h_pre, h_tar) / (jnp.maximum(h_pre, h_tar) + eps)
    return jnp.abs(1 - ious) + jnp.cos((w_ratio + h_ratio) * np.pi * 0.25)


def _make_iou_loss_class(fn, extra=()):
    class _Loss:
        def __init__(self, eps=1e-6, reduction='mean', loss_weight=1.0,
                     **kwargs):
            self.eps = eps
            self.reduction = reduction
            self.loss_weight = loss_weight
            self.kwargs = {k: kwargs[k] for k in extra if k in kwargs}

        def __call__(self, pred, target, weight=None, avg_factor=None,
                     reduction_override=None):
            reduction = reduction_override or self.reduction
            loss = fn(pred, target, eps=self.eps, **self.kwargs)
            if weight is not None:
                # align (n, 4) bbox weights with (n,) iou losses and
                # vice versa (ref: iou_loss.py:270-276)
                while weight.ndim > loss.ndim:
                    weight = weight.mean(-1)
                if weight.ndim < loss.ndim:
                    weight = weight[..., None]
            return self.loss_weight * weight_reduce_loss(
                loss, weight, reduction, avg_factor)
    return _Loss


IoULoss = LOSSES.register_module(name='IoULoss',
                                 module=_make_iou_loss_class(iou_loss))
GIoULoss = LOSSES.register_module(name='GIoULoss',
                                  module=_make_iou_loss_class(giou_loss))
AIoULoss = LOSSES.register_module(name='AIoULoss',
                                  module=_make_iou_loss_class(aiou_loss))
BoundedIoULoss = LOSSES.register_module(
    name='BoundedIoULoss',
    module=_make_iou_loss_class(bounded_iou_loss, extra=('beta',)))

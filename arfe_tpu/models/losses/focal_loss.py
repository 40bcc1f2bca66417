"""Sigmoid focal loss (pure jnp).

TPU-native counterpart of ref: mmdet/models/losses/focal_loss.py (the python
reference implementation at :10-26 is the numerical spec; the CUDA kernel
ops/sigmoid_focal_loss is replaced by XLA fusion).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import LOSSES
from .utils import weight_reduce_loss


def py_sigmoid_focal_loss(pred, target, weight=None, gamma=2.0, alpha=0.25,
                          reduction='mean', avg_factor=None):
    """pred: (N, C) logits; target: (N,) int labels in [0, C] where C means
    background (no positive class), OR (N, C) one-hot floats."""
    if target.ndim == pred.ndim - 1:
        onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
    else:
        onehot = target.astype(pred.dtype)
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) \
        * pt ** gamma
    bce = jnp.maximum(pred, 0) - pred * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_weight
    if weight is not None and weight.ndim == 1:
        weight = weight[:, None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        assert use_sigmoid, 'only sigmoid focal loss is supported'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * py_sigmoid_focal_loss(
            pred, target, weight, self.gamma, self.alpha, reduction,
            avg_factor)

"""L1 / SmoothL1 / BalancedL1 / MSE regression losses
(ref: mmdet/models/losses/smooth_l1_loss.py, balanced_l1_loss.py,
mse_loss.py)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...registry import LOSSES
from .utils import weight_reduce_loss


def smooth_l1_loss(pred, target, beta=1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def l1_loss(pred, target):
    return jnp.abs(pred - target)


def balanced_l1_loss(pred, target, beta=1.0, alpha=0.5, gamma=1.5):
    """(ref: balanced_l1_loss.py — Libra R-CNN)."""
    diff = jnp.abs(pred - target)
    b = np.e ** (gamma / alpha) - 1
    return jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1)
        - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = smooth_l1_loss(pred, target, self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            l1_loss(pred, target), weight, reduction, avg_factor)


@LOSSES.register_module()
class BalancedL1Loss:
    def __init__(self, alpha=0.5, gamma=1.5, beta=1.0, reduction='mean',
                 loss_weight=1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        loss = balanced_l1_loss(pred, target, self.beta, self.alpha,
                                self.gamma)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class MSELoss:
    def __init__(self, reduction='mean', loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None):
        reduction = reduction_override or self.reduction
        return self.loss_weight * weight_reduce_loss(
            (pred - target) ** 2, weight, reduction, avg_factor)

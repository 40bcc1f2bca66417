"""Loss reduction helpers (ref: mmdet/models/losses/utils.py)."""
from __future__ import annotations

import jax.numpy as jnp


def reduce_loss(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return loss.mean()
    if reduction == 'sum':
        return loss.sum()
    raise ValueError(f'invalid reduction {reduction}')


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    """Apply element-wise weight then reduce
    (ref: losses/utils.py weight_reduce_loss)."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return loss.sum() / jnp.maximum(avg_factor, 1e-6)
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor only supported with mean reduction')

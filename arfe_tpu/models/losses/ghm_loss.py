"""Gradient Harmonizing Mechanism losses (ref:
mmdet/models/losses/ghm_loss.py:21-172).

The reference's per-bin python loop (with .item() host syncs) becomes a
vectorized bincount: bin index per element, per-bin counts via one-hot sum,
weight = total/count/n_nonempty. Note: the reference's ``momentum`` keeps an
EMA of bin counts in a module buffer — stateful and incompatible with pure
jit; it is accepted for config compatibility but behaves as momentum=0
(instantaneous counts). The harmonizing weights themselves are identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import LOSSES


def _ghm_weights(g, valid, bins):
    """weights[i] = tot/count_bin(i)/n_nonempty for valid i, else 0."""
    gi = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    onehot = jax.nn.one_hot(gi, bins, dtype=jnp.float32) \
        * valid.astype(jnp.float32)[..., None]
    flat = onehot.reshape(-1, bins)
    counts = flat.sum(axis=0)                      # (bins,)
    tot = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    n_nonempty = jnp.maximum((counts > 0).sum().astype(jnp.float32), 1.0)
    per_bin = jnp.where(counts > 0, tot / jnp.maximum(counts, 1.0), 0.0)
    w = per_bin[gi] * valid.astype(jnp.float32)
    return w / n_nonempty, tot


@LOSSES.register_module()
class GHMC:
    """GHM classification loss (ref :21-96)."""

    def __init__(self, bins=10, momentum=0, use_sigmoid=True,
                 loss_weight=1.0):
        assert use_sigmoid
        self.bins = bins
        self.momentum = momentum  # accepted; see module docstring
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight=None, avg_factor=None,
                 **kwargs):
        """pred (N, C) logits; target (N,) int labels (C = background) or
        (N, C) binary; label_weight (N,) or (N, C)."""
        c = pred.shape[-1]
        if target.ndim != pred.ndim:
            onehot = jax.nn.one_hot(
                jnp.clip(target, 0, c), c + 1,
                dtype=jnp.float32)[..., :c]
            target = onehot
            if label_weight is not None and label_weight.ndim != pred.ndim:
                label_weight = jnp.broadcast_to(label_weight[..., None],
                                                pred.shape)
        target = target.astype(jnp.float32)
        if label_weight is None:
            label_weight = jnp.ones_like(pred)
        valid = label_weight > 0
        g = jax.lax.stop_gradient(
            jnp.abs(jax.nn.sigmoid(pred) - target))
        weights, tot = _ghm_weights(g, valid, self.bins)
        bce = jnp.maximum(pred, 0) - pred * target + \
            jnp.log1p(jnp.exp(-jnp.abs(pred)))
        return self.loss_weight * (bce * weights).sum() / tot


@LOSSES.register_module()
class GHMR:
    """GHM regression loss with the Authentic Smooth L1 (ref :99-172)."""

    def __init__(self, mu=0.02, bins=10, momentum=0, loss_weight=1.0):
        self.mu = mu
        self.bins = bins
        self.momentum = momentum
        self.loss_weight = loss_weight

    def __call__(self, pred, target, label_weight=None, avg_factor=None,
                 **kwargs):
        mu = self.mu
        diff = pred - target
        loss = jnp.sqrt(diff * diff + mu * mu) - mu
        g = jax.lax.stop_gradient(
            jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
        if label_weight is None:
            label_weight = jnp.ones_like(pred)
        if label_weight.ndim != pred.ndim:
            label_weight = jnp.broadcast_to(label_weight[..., None],
                                            pred.shape)
        valid = label_weight > 0
        weights, _ = _ghm_weights(g, valid, self.bins)
        tot = jnp.maximum(label_weight.sum().astype(jnp.float32), 1.0)
        return self.loss_weight * (loss * weights).sum() / tot

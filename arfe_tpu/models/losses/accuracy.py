"""Top-k accuracy metric (ref: mmdet/models/losses/accuracy.py)."""
from __future__ import annotations

import jax.numpy as jnp


def accuracy(pred, target, topk=1, valid_mask=None):
    """pred (N, C) logits, target (N,) int. Returns percentage scalar(s)."""
    single = isinstance(topk, int)
    topks = (topk,) if single else tuple(topk)
    maxk = max(topks)
    order = jnp.argsort(-pred, axis=-1)[:, :maxk]
    correct = order == target[:, None]
    if valid_mask is None:
        denom = pred.shape[0]
        res = [correct[:, :k].any(axis=1).sum() * 100.0 / denom
               for k in topks]
    else:
        denom = jnp.maximum(valid_mask.sum(), 1)
        res = [(correct[:, :k].any(axis=1) & valid_mask).sum() * 100.0
               / denom for k in topks]
    return res[0] if single else res


class Accuracy:
    def __init__(self, topk=(1,)):
        self.topk = topk

    def __call__(self, pred, target):
        return accuracy(pred, target, self.topk)

"""Cross-entropy family, including ARFE's custom variants.

TPU-native counterpart of ref: mmdet/models/losses/cross_entropy_loss.py:
- plain softmax CE (ref :8-34)
- ``use_dis`` -> distribution_loss anti-peaked-softmax regularizer (:36-64)
- ``use_multi_cls`` -> multi_classes_loss image-level presence hinge (:66-97)
- sigmoid BCE with RPN-style binary label expansion (:105-132)
- mask CE (:135-142)

Static-shape notes: ``multi_classes_loss`` takes a multi-hot presence vector
instead of the reference's python list of label ids; everything else is
shape-identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import LOSSES
from .utils import weight_reduce_loss


def cross_entropy(pred, label, weight=None, reduction='mean',
                  avg_factor=None):
    """Softmax CE over the last dim; label int (N,)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    # clamp: out-of-range labels would silently poison the loss under XLA
    idx = jnp.clip(label.astype(jnp.int32), 0, pred.shape[-1] - 1)
    loss = -jnp.take_along_axis(logp, idx[..., None], axis=-1)[..., 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy(pred, label, weight=None, reduction='mean',
                         avg_factor=None):
    """Sigmoid BCE with logits. If label has one fewer dim than pred, labels
    are class indices expanded RPN-style (ref: :105-132): label >= 1 marks
    class label-1 positive... in v2.0 RPN labels are already 0/1 with
    pred shape (N, 1) -> we broadcast."""
    if pred.ndim != label.ndim:
        if pred.shape[-1] == 1:
            label = label[..., None]
            if weight is not None and weight.ndim != pred.ndim:
                weight = weight[..., None]
        else:
            onehot = (label[..., None] - 1 ==
                      jnp.arange(pred.shape[-1])) & (label[..., None] >= 1)
            label = onehot
            if weight is not None and weight.ndim != pred.ndim:
                weight = jnp.broadcast_to(weight[..., None], pred.shape)
    label = label.astype(pred.dtype)
    loss = jnp.maximum(pred, 0) - pred * label + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mask_cross_entropy(pred, target, label, reduction='mean',
                       avg_factor=None):
    """Per-roi BCE on the predicted class's mask channel (ref: :135-142).
    pred: (R, h, w, C); target: (R, h, w); label: (R,)."""
    assert reduction == 'mean' and avg_factor is None
    sel = jnp.take_along_axis(
        pred, label[:, None, None, None].astype(jnp.int32), axis=-1)[..., 0]
    loss = jnp.maximum(sel, 0) - sel * target + \
        jnp.log1p(jnp.exp(-jnp.abs(sel)))
    return loss.mean()


def distribution_loss(pred, label, weight=None, reduction='mean',
                      avg_factor=None):
    """CE + anti-peaked-softmax regularizer (ref: :36-64, ARFE custom)."""
    soft = jax.nn.softmax(pred, axis=-1)
    max_ = soft.max(axis=-1, keepdims=True)
    soft = soft / (max_ + 1e-9)
    max_pred = soft.max(axis=-1, keepdims=True)
    soft = jnp.where(soft == max_pred, jnp.zeros_like(soft), soft)
    alpha, beta = 1.0, 0.0
    reg_pred = alpha * soft + beta
    dis = 1.0 - (jnp.min((max_pred * 2.0 - soft)
                         * (1.0 - jnp.tanh(reg_pred)), axis=-1) * 0.5)
    dis_loss = dis.mean()
    ce = cross_entropy(pred, label, weight, reduction, avg_factor)
    return ce + dis_loss


def multi_classes_loss(pred, presence, weight=None, reduction='mean',
                       avg_factor=None):
    """Image-level class-presence hinge (ref: :66-97, ARFE "+fac").

    Args:
        pred: (C, 2) per-class background/foreground logits.
        presence: (C,) multi-hot {0,1} of classes present in the image
            (static-shape replacement for the reference's index list).
    """
    p = jax.nn.softmax(pred.reshape(-1, 2), axis=-1)
    pd = p[:, 1]
    ori = presence.astype(pd.dtype)
    pos = jnp.where(ori == 1,
                    jnp.tanh(1 - pd) + (pd < 0.5).astype(pd.dtype), ori)
    pos_loss = pos.max()
    neg = jnp.where(ori == 0,
                    jnp.tanh(pd) + (pd > 0.5).astype(pd.dtype),
                    jnp.zeros_like(ori))
    neg_loss = neg.max()
    return (pos_loss + neg_loss) * 0.5


@LOSSES.register_module()
class CrossEntropyLoss:
    def __init__(self, use_sigmoid=False, use_mask=False, use_dis=False,
                 use_multi_cls=False, reduction='mean', loss_weight=1.0):
        assert not (use_sigmoid and use_mask)
        self.use_sigmoid = use_sigmoid
        self.use_mask = use_mask
        self.use_dis = use_dis
        self.use_multi_cls = use_multi_cls
        self.reduction = reduction
        self.loss_weight = loss_weight
        if use_sigmoid:
            self.cls_criterion = binary_cross_entropy
        elif use_mask:
            self.cls_criterion = mask_cross_entropy
        elif use_dis:
            self.cls_criterion = distribution_loss
        elif use_multi_cls:
            self.cls_criterion = multi_classes_loss
        else:
            self.cls_criterion = cross_entropy

    def __call__(self, cls_score, label, weight=None, avg_factor=None,
                 reduction_override=None, **kwargs):
        reduction = reduction_override or self.reduction
        return self.loss_weight * self.cls_criterion(
            cls_score, label, weight, reduction=reduction,
            avg_factor=avg_factor, **kwargs)

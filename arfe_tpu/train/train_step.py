"""Jitted train step + loss parsing.

TPU-native counterpart of ref: mmdet/apis/train.py:35-80 (batch_processor /
parse_losses) and the mmcv OptimizerHook loss.backward -> clip -> step cycle.
The whole step — forward, losses, backward, optimizer — is one jit; under a
data mesh, gradient reduction is a compiler-inserted psum (replaces the
reference's NCCL allreduce, ref: core/utils/dist_utils.py:9-41).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def parse_losses(losses):
    """Sum every 'loss*' entry into the total (ref: apis/train.py:35-55);
    non-loss entries (e.g. acc) pass through as log scalars."""
    log_vars = {}
    total = 0.0
    for name, value in losses.items():
        if isinstance(value, (list, tuple)):
            value = sum(value)
        log_vars[name] = value
        if 'loss' in name:
            total = total + value
    log_vars['loss'] = total
    return total, log_vars


def make_train_step(model, optimizer, donate=True):
    """Returns jitted step(params, opt_state, batch, key) ->
    (params, opt_state, log_vars). The LR schedule's iteration counter lives
    in opt_state (optax scale_by_schedule).

    batch dict: img (B,H,W,3), img_shape (B,2), gt_bboxes (B,G,4),
    gt_valid (B,G), gt_labels (B,G).
    """

    def step(params, opt_state, batch, key):
        def loss_fn(p):
            kwargs = {}
            for k in ('gt_mask_crops', 'gt_semantic_seg'):
                if k in batch:
                    kwargs[k] = batch[k]
            losses = model.forward_train(
                p, batch['img'], batch['img_shape'], batch['gt_bboxes'],
                batch['gt_valid'], batch['gt_labels'], key, **kwargs)
            return parse_losses(losses)

        (total, log_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        log_vars = {k: jnp.asarray(v, jnp.float32)
                    for k, v in log_vars.items()}
        return params, opt_state, log_vars

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)

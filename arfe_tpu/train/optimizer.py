"""Optimizer + LR schedule construction.

TPU-native counterpart of ref: mmdet/core/optimizer/ (torch SGD via registry,
DefaultOptimizerConstructor with paramwise lr/wd multipliers) and the mmcv
lr hooks (step policy + linear warmup, ref:
configs/_base_/schedules/schedule_1x.py:1-10). Built on optax.

Key differences from torch semantics handled here:
- BN running stats live in the param tree but are buffers: they are masked
  out of every update (and get no grads anyway — see layers.BatchNorm).
- frozen_stages params reach here with zero grads (stop_gradient); weight
  decay must also skip them, so the trainable mask is path-based.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.tree_util import keystr, tree_map_with_path


def _path_str(path):
    return keystr(path).replace("['", '.').replace("']", '').lstrip('.')


def make_masks(params, frozen_prefixes=(), no_decay_keys=('running_mean',
                                                          'running_var')):
    """Returns (trainable_mask, decay_mask) boolean pytrees.

    frozen_prefixes: dotted path prefixes (e.g. 'backbone.conv1',
    'backbone.layer1') excluded from updates entirely.
    """
    def trainable(path, leaf):
        p = _path_str(path)
        if any(p.endswith(k) for k in no_decay_keys):
            return False
        return not any(p.startswith(f) for f in frozen_prefixes)

    def decay(path, leaf):
        return trainable(path, leaf)

    return (tree_map_with_path(trainable, params),
            tree_map_with_path(decay, params))


def frozen_prefixes_from_cfg(model_cfg):
    """Derive frozen path prefixes from a detector config
    (ref: resnet.py:616-633 _freeze_stages)."""
    out = []
    bb = model_cfg.get('backbone', {})
    fs = bb.get('frozen_stages', -1)
    if fs >= 0:
        if bb.get('deep_stem', False) or bb.get('type') == 'ResNetV1d':
            out.append('backbone.stem')
        else:
            out += ['backbone.conv1', 'backbone.bn1']
    for i in range(1, fs + 1):
        out.append(f'backbone.layer{i}')
    return out


def build_lr_schedule(lr_config, base_lr, iters_per_epoch):
    """Step policy + warmup (mmcv LrUpdaterHook semantics)."""
    cfg = dict(lr_config or {})
    policy = cfg.get('policy', 'step')
    warmup = cfg.get('warmup', None)
    warmup_iters = cfg.get('warmup_iters', 500)
    warmup_ratio = cfg.get('warmup_ratio', 0.1)
    steps = cfg.get('step', [])
    gamma = cfg.get('gamma', 0.1)

    boundaries = jnp.asarray([s * iters_per_epoch for s in steps])

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        if policy == 'step':
            n_passed = (it[None] >= boundaries).sum() if len(steps) else 0
            lr = base_lr * gamma ** n_passed
        elif policy == 'fixed':
            lr = jnp.asarray(base_lr)
        else:
            raise KeyError(f'unsupported lr policy {policy}')
        if warmup == 'linear':
            k = jnp.clip(it / warmup_iters, 0.0, 1.0)
            warm = base_lr * (warmup_ratio * (1 - k) + k)
            lr = jnp.where(it < warmup_iters, warm * (lr / base_lr), lr)
        elif warmup == 'constant':
            lr = jnp.where(it < warmup_iters, base_lr * warmup_ratio, lr)
        elif warmup == 'exp':
            k = warmup_ratio ** (1 - it / warmup_iters)
            lr = jnp.where(it < warmup_iters, base_lr * k, lr)
        return lr

    return schedule


def build_optimizer(optimizer_cfg, lr_schedule, params, frozen_prefixes=(),
                    grad_clip=None):
    """optimizer_cfg e.g. dict(type='SGD', lr=0.02, momentum=0.9,
    weight_decay=0.0001) (ref: schedules/schedule_1x.py:2)."""
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'SGD')
    cfg.pop('lr', None)
    trainable_mask, decay_mask = make_masks(params, frozen_prefixes)

    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip['max_norm']))
    wd = cfg.pop('weight_decay', 0.0)
    if wd:
        txs.append(optax.add_decayed_weights(wd, mask=decay_mask))
    if opt_type == 'SGD':
        momentum = cfg.pop('momentum', 0.0)
        txs.append(optax.trace(decay=momentum, nesterov=cfg.pop(
            'nesterov', False)))
    elif opt_type in ('Adam', 'AdamW'):
        betas = tuple(cfg.pop('betas', (0.9, 0.999)))
        txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    else:
        raise KeyError(f'unsupported optimizer {opt_type}')
    txs.append(optax.scale_by_schedule(lambda it: -lr_schedule(it)))
    tx = optax.chain(*txs)
    base_init, base_update = tx.init, tx.update

    class _Masked:
        def init(self, params):
            return base_init(params)

        def update(self, grads, state, params=None):
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads,
                trainable_mask)
            updates, state = base_update(grads, state, params)
            updates = jax.tree_util.tree_map(
                lambda u, m: u if m else jnp.zeros_like(u), updates,
                trainable_mask)
            return updates, state

    return _Masked()

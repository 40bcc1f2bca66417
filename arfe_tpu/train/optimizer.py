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


def _is_norm_path(path_str):
    """A param belonging to a BN/GN layer (our ConvModule names norms
    ``bn``; backbones use bn1/bn2/.../gn; HRNet transitions use index '1'
    inside ConvBN — those also expose running stats siblings, handled by
    the caller)."""
    import re
    return bool(re.search(r'(^|\.)((bn|gn|norm)\w*)(\.|$)', path_str))


def paramwise_multipliers(params, paramwise_cfg):
    """lr / weight-decay multiplier pytrees
    (ref: mmdet/core/optimizer/default_constructor.py:13-180 —
    bias_lr_mult, bias_decay_mult, norm_decay_mult, dcn_offset_lr_mult,
    plus mmcv's custom_keys)."""
    cfg = dict(paramwise_cfg or {})
    bias_lr = cfg.get('bias_lr_mult', 1.0)
    bias_wd = cfg.get('bias_decay_mult', 1.0)
    norm_wd = cfg.get('norm_decay_mult', 1.0)
    dcn_lr = cfg.get('dcn_offset_lr_mult', 1.0)
    custom = cfg.get('custom_keys', {})

    # find BN parents via running-stat siblings
    flat = {}

    def collect(d, prefix=''):
        if isinstance(d, dict):
            for k, v in d.items():
                collect(v, f'{prefix}.{k}' if prefix else k)
        else:
            flat[prefix] = d
    collect(params)
    bn_parents = {p.rsplit('.', 1)[0] for p in flat
                  if p.endswith('running_mean')}

    def mults(path, leaf):
        p = _path_str(path)
        for key, sub in custom.items():
            if key in p:
                return (sub.get('lr_mult', 1.0),
                        sub.get('decay_mult', 1.0))
        parent = p.rsplit('.', 1)[0] if '.' in p else ''
        is_norm = parent in bn_parents or _is_norm_path(p)
        lr_m, wd_m = 1.0, 1.0
        if is_norm:
            wd_m = norm_wd
        elif p.endswith('.bias'):
            lr_m, wd_m = bias_lr, bias_wd
        if 'conv_offset' in p:
            lr_m = dcn_lr
        return (lr_m, wd_m)

    lr_tree = tree_map_with_path(lambda pa, l: mults(pa, l)[0], params)
    wd_tree = tree_map_with_path(lambda pa, l: mults(pa, l)[1], params)
    return lr_tree, wd_tree


# optimizer gradient transforms, keyed by config ``type``
# (counterpart of the reference's torch-optimizer registry)
OPTIMIZERS = {}


def register_optimizer(name):
    def deco(fn):
        OPTIMIZERS[name] = fn
        return fn
    return deco


@register_optimizer('SGD')
def _sgd(cfg):
    return optax.trace(decay=cfg.pop('momentum', 0.0),
                       nesterov=cfg.pop('nesterov', False))


@register_optimizer('Adam')
@register_optimizer('AdamW')
def _adam(cfg):
    betas = tuple(cfg.pop('betas', (0.9, 0.999)))
    return optax.scale_by_adam(b1=betas[0], b2=betas[1],
                               eps=cfg.pop('eps', 1e-8))


@register_optimizer('RMSprop')
def _rmsprop(cfg):
    return optax.scale_by_rms(decay=cfg.pop('alpha', 0.99),
                              eps=cfg.pop('eps', 1e-8))


def build_optimizer(optimizer_cfg, lr_schedule, params, frozen_prefixes=(),
                    grad_clip=None):
    """optimizer_cfg e.g. dict(type='SGD', lr=0.02, momentum=0.9,
    weight_decay=0.0001, paramwise_cfg=dict(norm_decay_mult=0))
    (ref: schedules/schedule_1x.py:2 +
    core/optimizer/default_constructor.py)."""
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'SGD')
    cfg.pop('lr', None)
    paramwise_cfg = cfg.pop('paramwise_cfg', None)
    trainable_mask, decay_mask = make_masks(params, frozen_prefixes)
    lr_mults, wd_mults = paramwise_multipliers(params, paramwise_cfg)

    txs = []
    if grad_clip:
        txs.append(optax.clip_by_global_norm(grad_clip['max_norm']))
    wd = cfg.pop('weight_decay', 0.0)
    if wd:
        if paramwise_cfg:
            # per-leaf decay multiplier
            def add_wd(updates, state, p=None):
                return jax.tree_util.tree_map(
                    lambda u, pp, m, dm: u + wd * dm * pp if m else u,
                    updates, p, decay_mask, wd_mults), state
            txs.append(optax.GradientTransformation(
                lambda p: optax.EmptyState(), add_wd))
        else:
            txs.append(optax.add_decayed_weights(wd, mask=decay_mask))
    if opt_type not in OPTIMIZERS:
        raise KeyError(f'unsupported optimizer {opt_type}')
    txs.append(OPTIMIZERS[opt_type](cfg))
    if paramwise_cfg:
        def scale_lr(updates, state, p=None):
            return jax.tree_util.tree_map(
                lambda u, m: u * m, updates, lr_mults), state
        txs.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(), scale_lr))
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

"""Data-parallel sharding over a device mesh.

TPU-native counterpart of the reference's DDP stack
(ref: mmdet/apis/train.py:120-131 MMDistributedDataParallel +
core/utils/dist_utils.py:9-56 allreduce hooks, SURVEY.md §2.4): one global
``jax.sharding.Mesh`` with a ``data`` axis; params are replicated, batches
sharded on dim 0, and XLA inserts the gradient psum over ICI — there is no
explicit collective or bucketing code to maintain.

The mesh carries a (reserved) ``model`` axis so tensor-parallel shardings can
be added later without changing call sites.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_model < 1:
        raise ValueError(
            f'mesh axes must be positive, got n_data={n_data}, '
            f'n_model={n_model} with {len(devices)} visible device(s)')
    if n_data * n_model > len(devices):
        raise ValueError(
            f'requested a {n_data}x{n_model} mesh but only '
            f'{len(devices)} device(s) are visible. On this machine the '
            'sitecustomize pins a 1-chip TPU platform; for multi-device '
            'CPU testing set jax.config.update("jax_platforms", "cpu") '
            'before any backend init plus '
            'XLA_FLAGS=--xla_force_host_platform_device_count=N '
            '(see tests/conftest.py / __graft_entry__.dryrun_multichip).')
    dev_array = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ('data', 'model'))


def shard_batch(mesh, batch):
    """Shard every array in the batch dict along dim 0 over 'data'. In a
    multi-process (multi-host) run each process holds only its local slice
    of the global batch and the arrays are assembled across hosts
    (parallel/multihost.py:global_batch)."""
    if jax.process_count() > 1:
        from .multihost import global_batch
        return global_batch(mesh, batch)
    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_step(model, optimizer, mesh, param_specs=None):
    """Data/tensor-parallel jitted train step: batch sharded on 'data',
    params replicated by default, or sharded over 'model' per
    ``param_specs`` (see :func:`tp_param_specs`); gradient reduction and
    the tensor-parallel collectives are compiler-inserted (GSPMD)."""
    from ..train.train_step import make_train_step

    step = make_train_step(model, optimizer, donate=True)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    def dp_step(params, opt_state, batch, key):
        batch = {k: jax.lax.with_sharding_constraint(v, data)
                 for k, v in batch.items()}
        return step(params, opt_state, batch, key)

    if param_specs is None:
        return jax.jit(dp_step, donate_argnums=(0, 1),
                       out_shardings=(repl, repl, repl))
    # TP: params enter pre-sharded (shard_params); let GSPMD propagate
    # the output shardings from the inputs
    return jax.jit(dp_step, donate_argnums=(0, 1))


def tp_param_specs(params, rules, mesh):
    """Per-leaf NamedSharding tree from (path-substring, PartitionSpec)
    rules; unmatched leaves replicate. Paths are dot-joined dict keys,
    e.g. 'roi_head.bbox_head.shared_fcs.0.weight' (Megatron-style FC
    sharding: fc0 column-parallel P('model', None), fc1 row-parallel
    P(None, 'model'))."""
    def spec_for(path):
        name = '.'.join(str(getattr(k, 'key', k)) for k in path)
        for sub, spec in rules:
            if sub in name:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(path), params)


def shard_params(mesh, params, specs):
    """device_put each leaf with its NamedSharding from tp_param_specs."""
    return jax.tree_util.tree_map(
        lambda leaf, sh: jax.device_put(leaf, sh), params, specs)


def make_dp_eval_step(model, mesh, rescale=True):
    """Data-parallel inference step; detections return fixed-size arrays
    sharded back to host (ref eval-time distribution: SURVEY.md §2.4 —
    no pickle round-trips)."""
    data = NamedSharding(mesh, P('data'))

    def eval_step(params, img, img_shapes, scale_factors):
        img = jax.lax.with_sharding_constraint(img, data)
        return model.simple_test(params, img, img_shapes, scale_factors,
                                 rescale=rescale)

    return jax.jit(eval_step)

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
    dev_array = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, ('data', 'model'))


def shard_batch(mesh, batch):
    """Shard every array in the batch dict along dim 0 over 'data'."""
    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_step(model, optimizer, mesh):
    """Data-parallel jitted train step: params/opt_state replicated, batch
    sharded on 'data'. Gradient reduction is compiler-inserted."""
    from ..train.train_step import make_train_step

    step = make_train_step(model, optimizer, donate=True)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P('data'))

    def dp_step(params, opt_state, batch, key):
        batch = {k: jax.lax.with_sharding_constraint(v, data)
                 for k, v in batch.items()}
        return step(params, opt_state, batch, key)

    return jax.jit(dp_step, donate_argnums=(0, 1),
                   out_shardings=(repl, repl, repl))


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

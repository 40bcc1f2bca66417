"""Multi-host (multi-process) distribution.

TPU-native counterpart of the reference's multi-node launch stack
(ref: tools/dist_train.sh:7-9 torch.distributed.launch, tools/train.py:95-99
init_dist, tools/slurm_train.sh:15-27): one process per host joins a
coordination service via ``jax.distributed.initialize``; afterwards
``jax.devices()`` is the GLOBAL device list, one mesh spans hosts, and each
process feeds only its local shard of the global batch
(``jax.make_array_from_process_local_data``). Gradient reduction needs no
further code — the same GSPMD psum now rides ICI within a slice and DCN
across slices.

Activation: set ``ARFE_DIST_INIT=1`` (done by tools/dist_train.sh when
``ARFE_MULTIHOST=1``). On TPU pods / slurm, ``jax.distributed.initialize``
auto-discovers the topology; elsewhere set ``ARFE_COORD_ADDR``,
``ARFE_NUM_PROCS`` and ``ARFE_PROC_ID`` explicitly (the 2-process CPU
test does this — tests/test_multihost.py).
"""
from __future__ import annotations

import os


def maybe_init_distributed():
    """Initialize jax.distributed when ARFE_DIST_INIT=1. Returns True if
    the process joined a multi-process group. Must run before any other
    JAX backend usage (ref init point: tools/train.py:95-99)."""
    if os.environ.get('ARFE_DIST_INIT') != '1':
        return False
    import jax
    kwargs = {}
    if os.environ.get('ARFE_COORD_ADDR'):
        kwargs = dict(
            coordinator_address=os.environ['ARFE_COORD_ADDR'],
            num_processes=int(os.environ['ARFE_NUM_PROCS']),
            process_id=int(os.environ['ARFE_PROC_ID']),
        )
    jax.distributed.initialize(**kwargs)
    return True


def process_info():
    """(rank, world_size) of this process; (0, 1) when not distributed."""
    import jax
    return jax.process_index(), jax.process_count()


def is_main_process():
    import jax
    return jax.process_index() == 0


def global_batch(mesh, batch):
    """Assemble each per-process local array into a global jax.Array
    sharded on 'data' (ref equivalent being replaced: per-rank
    DistributedGroupSampler slices consumed by per-rank DDP replicas,
    datasets/samplers/group_sampler.py:51)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P('data'))
    return {k: jax.make_array_from_process_local_data(
        sharding, np.asarray(v)) for k, v in batch.items()}

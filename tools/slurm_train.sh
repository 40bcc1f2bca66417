#!/usr/bin/env bash
# SLURM launcher (ref: tools/slurm_train.sh). TPU pods run ONE process per
# HOST (not per chip); jax.distributed.initialize discovers peers from the
# SLURM env, and the mesh + compiler collectives handle intra/inter-host
# parallelism (no per-GPU process spawn as in the reference).
set -x
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-16}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
ARFE_DIST_INIT=1 \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py ${CONFIG} --work-dir=${WORK_DIR} ${PY_ARGS}

#!/usr/bin/env bash
# Multi-chip training launcher (ref: tools/dist_train.sh).
# On TPU there are no per-device processes to spawn: one process drives the
# whole mesh and jit inserts the gradient psum over ICI. Multi-HOST pods
# need one process per host with jax.distributed.initialize (set
# ARFE_MULTIHOST=1 and launch this script on every host).
CONFIG=$1
shift
if [ "${ARFE_MULTIHOST:-0}" = "1" ]; then
  export ARFE_DIST_INIT=1
fi
python "$(dirname "$0")/train.py" "$CONFIG" "$@"

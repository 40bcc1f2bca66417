#!/usr/bin/env bash
# Multi-chip eval launcher (ref: tools/dist_test.sh): shards images over the
# mesh with fixed-size on-device detection arrays (no pickle round-trips).
CONFIG=$1
CHECKPOINT=$2
shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --multi-chip "$@"

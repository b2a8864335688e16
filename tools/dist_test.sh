#!/usr/bin/env bash
# Parity shim for the reference's tools/dist_test.sh.
CONFIG=$1
CHECKPOINT=$2
GPUS=${3:-}
shift 3 2>/dev/null || shift 2
python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"

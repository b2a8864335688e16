#!/usr/bin/env bash
# Parity shim for the reference's tools/dist_train.sh (torch.distributed.launch).
# Single-controller JAX uses every local device automatically; GPUS is kept
# for CLI compatibility and ignored.
CONFIG=$1
GPUS=${2:-}
shift 2 2>/dev/null || shift 1
python "$(dirname "$0")/train.py" "$CONFIG" "$@"

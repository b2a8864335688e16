#!/usr/bin/env bash
# SLURM launcher shim (reference tools/slurm_train.sh).
# Single-controller JAX: one process drives every local chip, so the srun
# geometry collapses to one task per node; multi-host meshes initialize via
# jax.distributed from the SLURM environment.
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
GPUS=${GPUS:-8}          # chips per node (informational — JAX discovers them)
SRUN_ARGS=${SRUN_ARGS:-}
shift 3
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks-per-node=1 \
    --kill-on-bad-exit=1 ${SRUN_ARGS} \
    python -u tools/train.py "${CONFIG}" --launcher slurm "$@"

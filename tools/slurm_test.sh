#!/usr/bin/env bash
# SLURM eval launcher shim (reference tools/slurm_test.sh).
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
SRUN_ARGS=${SRUN_ARGS:-}
shift 4
srun -p "${PARTITION}" --job-name="${JOB_NAME}" --ntasks-per-node=1 \
    --kill-on-bad-exit=1 ${SRUN_ARGS} \
    python -u tools/test.py "${CONFIG}" "${CHECKPOINT}" "$@"

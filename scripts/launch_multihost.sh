#!/usr/bin/env bash
# Multi-host training launcher — the TPU-native replacement for the
# reference's per-GPU torch.distributed launcher (reference dist_train.sh).
# One process per HOST; jax.distributed handles rendezvous.
#
#   COORDINATOR=10.0.0.1:1234 NUM_PROCESSES=4 PROCESS_ID=$(hostname_index) \
#       bash scripts/launch_multihost.sh -e experiments/obman_30k.json [flags]
set -euo pipefail
export JAX_COORDINATOR_ADDRESS="${COORDINATOR:?set COORDINATOR=host:port}"
export JAX_NUM_PROCESSES="${NUM_PROCESSES:?set NUM_PROCESSES}"
export JAX_PROCESS_ID="${PROCESS_ID:?set PROCESS_ID}"
exec python -m alignsdf_tpu.cli.train "$@"

#!/usr/bin/env bash
# Multi-host TPU-pod training launcher (role parity with the reference's
# slurm/train_multi_node.sh torchrun+NCCL setup; on TPU pods every host
# runs the same command and jax.distributed.initialize() discovers the
# topology from the TPU metadata — no rendezvous flags needed).
#
# Single host (one chip / one slice):
#   bash scripts/train_tpu_pod.sh configs/train/bridge.yaml [overrides...]
# Pod (run on every worker, e.g. via gcloud):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#     "cd $REPO && bash scripts/train_tpu_pod.sh configs/train/bridge.yaml"
set -euo pipefail

CONFIG=${1:?usage: train_tpu_pod.sh <config.yaml> [key=value ...]}
shift || true

export TF_CPP_MIN_LOG_LEVEL=${TF_CPP_MIN_LOG_LEVEL:-2}
# host-side tf.data must never touch accelerators
export TF_FORCE_GPU_ALLOW_GROWTH=false

ARGS=(--config "$CONFIG")
# Multi-host: auto-detect from TPU runtime env vars when present, but those
# are not guaranteed shell exports on every launcher — set OPZ_DISTRIBUTED=1
# explicitly on pods to be safe (silently skipping initialize() would make
# every host train independently).
if [[ "${OPZ_DISTRIBUTED:-}" == "1" || -n "${TPU_WORKER_HOSTNAMES:-}" || -n "${MEGASCALE_COORDINATOR_ADDRESS:-}" ]]; then
  ARGS+=(--distributed)
fi

exec python "$(dirname "$0")/run.py" "${ARGS[@]}" "$@"

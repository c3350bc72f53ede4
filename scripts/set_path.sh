#!/bin/bash
# One-time environment setup (TPU-repo equivalent of the reference's
# scripts/set_path.sh): export the data/log roots the configs interpolate
# (${env:VLA_DATA_DIR} / ${env:VLA_LOG_DIR}) and persist them to ~/.bashrc.
#
#   VLA_DATA_DIR=/data VLA_LOG_DIR=/log WANDB_ENTITY=me bash scripts/set_path.sh

set -u

VLA_DATA_DIR="${VLA_DATA_DIR:-${PWD}/data}"
VLA_LOG_DIR="${VLA_LOG_DIR:-${PWD}/log}"
mkdir -p "$VLA_DATA_DIR" "$VLA_LOG_DIR"

export VLA_DATA_DIR VLA_LOG_DIR
echo "Data directory: $VLA_DATA_DIR"
echo "Log  directory: $VLA_LOG_DIR"

touch ~/.bashrc 2>/dev/null || true
append_once() {
  grep -qxF "$1" ~/.bashrc 2>/dev/null || echo "$1" >> ~/.bashrc 2>/dev/null || true
}
append_once "export VLA_DATA_DIR=\"$VLA_DATA_DIR\""
append_once "export VLA_LOG_DIR=\"$VLA_LOG_DIR\""

if [ -n "${WANDB_ENTITY:-}" ]; then
  export VLA_WANDB_ENTITY="$WANDB_ENTITY"
  append_once "export VLA_WANDB_ENTITY=\"$WANDB_ENTITY\""
  echo "WandB entity: $VLA_WANDB_ENTITY"
else
  echo "No WANDB_ENTITY given — set wandb=null in configs to disable logging."
fi

echo "Fetch the PaliGemma base with scripts/download_paligemma.py (sets"
echo "pretrained_model_path / tokenizer for the train configs)."

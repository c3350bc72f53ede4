#!/bin/bash
# Short single-chip training smoke (TPU-repo equivalent of the
# reference's slurm/test_training_single_gpu_no_slurm.sh:1-40): tiny
# batch, debug logging of batch contents, EMA on, checkpoint every 16
# updates. Needs RLDS data at $VLA_DATA_DIR/resize_224 and a local
# PaliGemma checkout (scripts/download_paligemma.py).
#
#   bash scripts/test_training_single_chip.sh [extra key=value overrides...]

set -eu

python scripts/run.py --config configs/train/bridge.yaml \
    debug=true \
    wandb=null \
    global_batch_size=16 \
    per_device_batch_size=16 \
    n_updates=64 \
    log_freq=4 \
    use_ema=true \
    ema_start=0 \
    save_model_freq=16 \
    save_model_start=0 \
    eval_freq=0 \
    "$@"

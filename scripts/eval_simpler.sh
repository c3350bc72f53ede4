#!/usr/bin/env bash
# SimplerEnv closed-loop eval launcher (role parity with the reference's
# slurm/eval_simpler_bridge.sh). Runs every bridge task sequentially.
#
#   bash scripts/eval_simpler.sh configs/eval/bridge.yaml /path/to/ckpt [n_episodes]
set -euo pipefail

CONFIG=${1:?usage: eval_simpler.sh <config.yaml> <checkpoint> [n_episodes] [key=value ...]}
CKPT=${2:?need checkpoint path}
shift 2
N=240
# only consume $3 as n_episodes when it is numeric; otherwise it is the
# first key=value override and stays in "$@"
if [[ $# -gt 0 && $1 =~ ^[0-9]+$ ]]; then
  N=$1
  shift
fi

TASKS=(
  widowx_carrot_on_plate
  widowx_put_eggplant_in_basket
  widowx_spoon_on_towel
  widowx_stack_cube
)

for TASK in "${TASKS[@]}"; do
  echo "=== $TASK ==="
  python "$(dirname "$0")/run.py" --config "$CONFIG" \
    checkpoint_path="$CKPT" env.task="$TASK" n_eval_episode="$N" "$@"
done

#!/usr/bin/env bash
# Standard eval protocol (reference: example_scripts/final/base_1f_vidgen.sh):
# 100-step DDPM, preds_per_test=10, best-of-10 metrics.
set -euo pipefail
DATA=${1:-datasets/mnist}
EXP=${2:-exp/smmnist_big5}
CKPT=${3:-}

python main.py --config configs/smmnist_DDPM_big5.yml \
    --data_path "$DATA" --exp "$EXP" --ni --video_gen -v vidgen \
    ${CKPT:+--ckpt "$CKPT"} \
    --config_mod sampling.subsample=100 sampling.preds_per_test=10 \
                 sampling.num_frames_pred=10 sampling.max_data_iter=100000

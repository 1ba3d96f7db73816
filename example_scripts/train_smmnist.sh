#!/usr/bin/env bash
# Flagship SMMNIST prediction training (reference protocol:
# example_scripts/final/training_scripts.sh). One TPU host; the data mesh
# scales over all local chips automatically.
set -euo pipefail
DATA=${1:-datasets/mnist}
EXP=${2:-exp/smmnist_big5}

python main.py --config configs/smmnist_DDPM_big5.yml \
    --data_path "$DATA" --exp "$EXP" --ni \
    --config_mod training.snapshot_freq=50000 sampling.subsample=100 \
                 sampling.num_frames_pred=10 sampling.preds_per_test=1

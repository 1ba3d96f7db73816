#!/usr/bin/env bash
# BAIR-shaped at-scale run on synthetic push-scene video pushed through the
# REAL TFRecord -> JPEG -> h5 pipeline (tools/make_synth_bair.py), closing
# the last video family without at-scale evidence. Mirrors
# example_scripts/train_smmnist_production.sh's segmented restart loop.
# Reference protocol: cond 2 -> pred 28 autoregressive blocks of 5
# (/root/reference/configs/bair_big.yml, example_scripts final).
set -euo pipefail
DATA=${1:-/root/data/BAIR_h5}
EXP=${2:-/root/exp/bair_big}
N_ITERS=${3:-10000}
SEG=${4:-5000}
PRED=${5:-28}

MODS="training.compute_dtype=bfloat16 training.n_iters=$N_ITERS \
 training.max_steps_per_run=$SEG training.snapshot_freq=$N_ITERS \
 training.snapshot_sampling=False training.stall_timeout=1200 \
 sampling.subsample=100 sampling.num_frames_pred=$PRED \
 sampling.preds_per_test=5 sampling.fvd=False"

RESUME=""
while true; do
    python main.py --config configs/bair_big.yml \
        --data_path "$DATA" --exp "$EXP" --ni --train $RESUME \
        --config_mod $MODS
    RESUME="--resume_training"
    grep -q "training done at step $N_ITERS" "$EXP/logs/stdout.txt" 2>/dev/null && break
done

# Full eval protocol on the trained checkpoint (cond 2 -> pred $PRED,
# best-of-5, 100-step DDPM, 256 test videos).
python main.py --config configs/bair_big.yml \
    --data_path "$DATA" --exp "$EXP" --ni --video_gen --ckpt $N_ITERS \
    --config_mod $MODS

#!/usr/bin/env bash
# Cityscapes-shaped at-scale run (128px, ngf=128) on synthetic dashcam video
# pushed through the REAL leftImg8bit_sequence PNG -> cityscapes_convert ->
# h5 pipeline (tools/make_synth_cityscapes.py). Single chip: the config's
# parallel.tensor=2 collapses to the data-only mesh (runner fallback).
# Reference protocol: cond 2 -> pred 28 autoregressive blocks of 5.
set -euo pipefail
DATA=${1:-/root/data/Cityscapes128_h5}
EXP=${2:-/root/exp/cityscapes_big}
N_ITERS=${3:-4000}
SEG=${4:-4000}
PRED=${5:-28}

MODS="training.compute_dtype=bfloat16 training.batch_size=32 \
 training.n_iters=$N_ITERS training.max_steps_per_run=$SEG \
 training.snapshot_freq=$N_ITERS training.snapshot_sampling=False \
 training.stall_timeout=1200 training.wire_dtype=uint8 \
 sampling.subsample=100 sampling.num_frames_pred=$PRED \
 sampling.batch_size=32 sampling.preds_per_test=2 sampling.fvd=False"

# auto-resume: an existing rolling checkpoint means a prior (possibly
# shorter) run — extend it instead of restarting from scratch
RESUME=""
[ -d "$EXP/logs/checkpoint" ] && RESUME="--resume_training"
while true; do
    python main.py --config configs/cityscapes_big.yml \
        --data_path "$DATA" --exp "$EXP" --ni --train $RESUME \
        --config_mod $MODS
    RESUME="--resume_training"
    grep -q "training done at step $N_ITERS" "$EXP/logs/stdout.txt" 2>/dev/null && break
done

python main.py --config configs/cityscapes_big.yml \
    --data_path "$DATA" --exp "$EXP" --ni --video_gen --ckpt $N_ITERS \
    --config_mod $MODS

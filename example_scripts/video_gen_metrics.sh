#!/usr/bin/env bash
# Generic metrics-eval driver: same interface as the reference's
# example_scripts/video_gen_metrics.sh (EXP CKPT NUMFRAMESPRED PREDSPERTEST
# DATAPATH NAME) — evaluates a trained experiment at a checkpoint with the
# standard protocol (DDPM-100, FVD on, best-of-PREDSPERTEST), reading the
# archived config from $EXP/logs/config.yml like the reference does.
# For DDIM/FPNDM: append model.version=DDIM (or FPNDM) to the config_mods.
set -euo pipefail
EXP=$1
CKPT=$2
NUMFRAMESPRED=$3
PREDSPERTEST=$4
DATAPATH=$5
NAME=${6:-eval}

python main.py --config "$EXP/logs/config.yml" --data_path "$DATAPATH" \
    --exp "$EXP" --ckpt "$CKPT" --seed 0 --ni --video_gen \
    -v "videos_${CKPT}_${NAME}_DDPM_100_traj${PREDSPERTEST}" \
    --config_mod sampling.fvd=True model.version=DDPM \
    sampling.subsample=100 sampling.num_frames_pred="$NUMFRAMESPRED" \
    sampling.preds_per_test="$PREDSPERTEST" sampling.max_data_iter=100000000

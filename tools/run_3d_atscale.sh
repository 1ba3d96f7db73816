#!/usr/bin/env bash
# 3D-family (unetmore3d, folded-frames Conv3d) at-scale run on synthetic
# SMMNIST — the only model family without a long-run closure (golden parity
# + a 300-step drive only, VERDICT r4 missing #4). Scaled ngf (the stock
# config's ngf=12 mirrors the reference's 32Gb-GPU grid entry,
# /root/reference/configs/smmnist_DDPM_small5_3d_32Gb.yml); protocol: cond 5
# -> pred 20 autoregressive blocks of 2 (reference ncsnpp_more.py:215-228,
# 327-354 for the 3D model path; eval same as smmnist).
set -euo pipefail
EXP=${1:-/root/exp/smmnist_3d}
N_ITERS=${2:-10000}
SEG=${3:-5000}
NGF=${4:-48}

MODS="model.ngf=$NGF training.compute_dtype=bfloat16 training.batch_size=64 \
 training.n_iters=$N_ITERS training.max_steps_per_run=$SEG \
 training.snapshot_freq=$N_ITERS training.snapshot_sampling=False \
 training.stall_timeout=1200 training.wire_dtype=float16 \
 sampling.subsample=100 sampling.num_frames_pred=20 \
 sampling.batch_size=64 sampling.preds_per_test=5 sampling.fvd=False"

# auto-resume: an existing rolling checkpoint means a prior (possibly
# shorter) run — extend it instead of restarting from scratch
RESUME=""
[ -d "$EXP/logs/checkpoint" ] && RESUME="--resume_training"
while true; do
    python main.py --config configs/smmnist_DDPM_small5_3d.yml \
        --data_path /tmp/smmnist_data --exp "$EXP" --ni --train $RESUME \
        --config_mod $MODS
    RESUME="--resume_training"
    grep -q "training done at step $N_ITERS" "$EXP/logs/stdout.txt" 2>/dev/null && break
done

python main.py --config configs/smmnist_DDPM_small5_3d.yml \
    --data_path /tmp/smmnist_data --exp "$EXP" --ni --video_gen --ckpt $N_ITERS \
    --config_mod $MODS

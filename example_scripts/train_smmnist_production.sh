#!/usr/bin/env bash
# Production SMMNIST training on the axon TPU backend: bf16 compute, fp16
# wire, and segmented execution (training.max_steps_per_run) to sidestep the
# TPU client's native H2D staging leak — each segment checkpoints and the
# loop resumes (crash-safe by construction; see BENCH_NOTES.md).
# training.stall_timeout arms the in-runner watchdog: a hung backend
# dispatch (observed r3) hard-exits the process and this loop resumes the
# segment from the rolling checkpoint.
#
# Measured r2: 50k steps in ~75min wall (ngf=64, batch 32, v5e) reaching
# video-prediction SSIM 0.814 (cond 5 -> pred 10, best-of-5).
set -euo pipefail
DATA=${1:-datasets/mnist}
EXP=${2:-exp/smmnist_big5}
N_ITERS=${3:-300000}
SEG=${4:-25000}

MODS="training.compute_dtype=bfloat16 training.n_iters=$N_ITERS \
 training.max_steps_per_run=$SEG training.batch_size=32 \
 training.stall_timeout=1200 \
 sampling.subsample=100 sampling.num_frames_pred=10"

RESUME=""
while true; do
    python main.py --config configs/smmnist_DDPM_big5.yml \
        --data_path "$DATA" --exp "$EXP" --ni --train $RESUME \
        --config_mod $MODS
    RESUME="--resume_training"
    grep -q "training done at step $N_ITERS" "$EXP/logs/stdout.txt" 2>/dev/null && break
    # fall through: next segment resumes from the rolling checkpoint
done

#!/usr/bin/env bash
# NCSNv2 FID closure (VERDICT r3 next #4): 10k-step synthetic-CIFAR train
# (ngf=128, B=128, bf16) with numbered checkpoints every 2k, then a
# --fast_fid sweep over checkpoints 2k..10k. Mirrors the reference's own
# image-model QA loop (/root/reference/runners/ncsn_runner.py:2432-2586);
# FID values use fabricated Inception weights (zero egress) — trajectory is
# learnability evidence, not paper-comparable.
set -euo pipefail
DATA=${1:-/root/data/cifar_synth}
EXP=${2:-/root/exp/ncsnv2_fid}
N_ITERS=${3:-10000}
SEG=${4:-2500}

MODS="training.compute_dtype=bfloat16 training.n_iters=$N_ITERS \
 training.max_steps_per_run=$SEG training.snapshot_freq=2000 \
 training.snapshot_sampling=False training.stall_timeout=1200 \
 training.val_freq=500"

RESUME=""
while true; do
    python main.py --config configs/cifar10_ncsnv2.yml \
        --data_path "$DATA" --exp "$EXP" --ni --train $RESUME \
        --config_mod $MODS
    RESUME="--resume_training"
    grep -q "training done at step $N_ITERS" "$EXP/logs/stdout.txt" 2>/dev/null && break
done

# Checkpoint-sweep FID (1000 samples/ckpt, full SMLD Langevin protocol).
# Needs Inception weights: MCVD_WEIGHTS_DIR (tools/make_eval_weights.py
# fabricates a set under zero egress). batch_size>=250 crashes the axon
# TPU worker ("kernel fault", OOM-shaped) — 100 is stable.
: "${MCVD_WEIGHTS_DIR:?set MCVD_WEIGHTS_DIR (tools/make_eval_weights.py)}"
python main.py --config configs/cifar10_ncsnv2.yml \
    --data_path "$DATA" --exp "$EXP" --ni --fast_fid \
    --config_mod $MODS fast_fid.begin_ckpt=2000 fast_fid.end_ckpt=$N_ITERS \
    fast_fid.freq=2000 fast_fid.num_samples=1000 fast_fid.batch_size=100

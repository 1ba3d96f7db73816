#!/usr/bin/env bash
# The paper's full experiment grid, expressed against this framework's CLI.
# Mirrors /root/reference/example_scripts/final/training_scripts.sh (the
# Slurm/sbatch catalog of every published run): same configs, same
# config_mod surface, same prediction/generation/interpolation/general
# task taxonomy — but TPU-idiomatic: one process per run (jax.distributed
# handles pods; there is no per-GPU base_1f/base_2f/base_4f split), and
# segmented restarts via training.max_steps_per_run instead of requeueing.
#
# Usage: source this file, then call e.g.
#   smmnist_prediction /data /exp/smmnist_pred
# Each function takes DATA EXP [EXTRA_MODS...].
set -uo pipefail

run() { # CONFIG DATA EXP MODS...
    local config=$1 data=$2 exp=$3; shift 3
    python main.py --config "configs/${config}.yml" --data_path "$data" \
        --exp "$exp" --ni --train --config_mod \
        training.snapshot_freq=50000 sampling.subsample=100 \
        sampling.clip_before=True sampling.max_data_iter=1 \
        model.version=DDPM "$@"
}

# ---------------- SMMNIST (training_scripts.sh:33-86) ----------------
smmnist_prediction()     { run smmnist_DDPM_big5 "$1" "$2" model.num_res_blocks=2 "${@:3}"; }
smmnist_generation()     { run smmnist_DDPM_big5 "$1" "$2" model.num_res_blocks=2 data.prob_mask_cond=0.50 "${@:3}"; }
smmnist_pred_spade()     { run smmnist_DDPM_big5_spade "$1" "$2" model.num_res_blocks=2 "${@:3}"; }
smmnist_gen_spade()      { run smmnist_DDPM_big5_spade "$1" "$2" model.num_res_blocks=2 data.prob_mask_cond=0.50 "${@:3}"; }
smmnist_interpolation()  { run smmnist_DDPM_big5 "$1" "$2" model.num_res_blocks=2 data.num_frames_future=5 "${@:3}"; }
smmnist_interp_pred()    { run smmnist_DDPM_big5 "$1" "$2" model.num_res_blocks=2 data.num_frames_future=5 data.prob_mask_future=0.5 "${@:3}"; }
smmnist_general()        { run smmnist_DDPM_big5 "$1" "$2" model.num_res_blocks=2 data.num_frames_future=5 data.prob_mask_future=0.5 data.prob_mask_cond=0.50 "${@:3}"; }

# ---------------- KTH (training_scripts.sh:88-118) ----------------
kth_prediction()  { run kth64_big "$1" "$2" sampling.num_frames_pred=20 data.num_frames=5 data.num_frames_cond=10 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
kth_pred_spade()  { run kth64_big_spade "$1" "$2" model.ngf=192 model.spade_dim=192 sampling.num_frames_pred=20 data.num_frames=5 data.num_frames_cond=10 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
kth_interp_pred() { run kth64_big_spade "$1" "$2" data.prob_mask_future=0.50 sampling.num_frames_pred=20 data.num_frames=10 data.num_frames_cond=10 data.num_frames_future=5 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
kth_general()     { run kth64_big "$1" "$2" data.prob_mask_cond=0.50 data.prob_mask_future=0.50 sampling.num_frames_pred=20 data.num_frames=5 data.num_frames_cond=5 data.num_frames_future=5 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }

# ---------------- BAIR (training_scripts.sh:120-160) ----------------
bair_prediction() { # cond=2 variant; pass data.num_frames_cond=1 for 5c1
    run bair_big "$1" "$2" model.ngf=192 model.n_head_channels=192 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
bair_generation() { run bair_big "$1" "$2" model.ngf=192 model.n_head_channels=192 data.prob_mask_cond=0.50 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
bair_pred_spade() { run bair_big_spade "$1" "$2" model.ngf=192 model.n_head_channels=192 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }
bair_general()    { run bair_big "$1" "$2" model.ngf=192 model.n_head_channels=192 data.prob_mask_cond=0.50 data.prob_mask_future=0.5 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 data.num_frames_future=2 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }

# ---------------- Cityscapes (training_scripts.sh:162-186) ----------------
cityscapes_prediction() { run cityscapes_big "$1" "$2" model.ngf=192 model.n_head_channels=192 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 training.batch_size=32 sampling.batch_size=100 "${@:3}"; }
cityscapes_pred_spade() { run cityscapes_big_spade "$1" "$2" model.ngf=256 model.n_head_channels=256 model.spade_dim=128 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 training.batch_size=16 sampling.batch_size=100 "${@:3}"; }
cityscapes_interp_pred() { run cityscapes_big_spade "$1" "$2" data.prob_mask_cond=0.5 model.ngf=256 model.n_head_channels=256 model.spade_dim=128 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 data.num_frames_future=2 training.batch_size=16 sampling.batch_size=100 "${@:3}"; }
cityscapes_general()    { run cityscapes_big_spade "$1" "$2" data.prob_mask_cond=0.5 data.prob_mask_future=0.5 model.ngf=256 model.n_head_channels=256 model.spade_dim=128 sampling.num_frames_pred=28 data.num_frames=5 data.num_frames_cond=2 data.num_frames_future=2 training.batch_size=16 sampling.batch_size=100 "${@:3}"; }

# ---------------- UCF-101 (training_scripts.sh:188-205) ----------------
ucf101_prediction() { run ucf101 "$1" "$2" model.ngf=288 model.n_head_channels=288 sampling.num_frames_pred=16 data.num_frames=4 data.num_frames_cond=4 training.batch_size=32 sampling.batch_size=100 "${@:3}"; }
ucf101_generation() { run ucf101 "$1" "$2" model.ngf=192 model.n_head_channels=192 data.prob_mask_cond=0.50 sampling.num_frames_pred=16 data.num_frames=4 data.num_frames_cond=4 training.batch_size=64 sampling.batch_size=100 "${@:3}"; }

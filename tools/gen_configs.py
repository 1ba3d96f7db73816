#!/usr/bin/env python
"""Generate the dataset config YAMLs.

Values mirror the reference experiment grid (reference: configs/*.yml) so
converted checkpoints and published protocols line up; the file layout is
ours (sorted keys, one generator). Run: python tools/gen_configs.py
"""

import copy
import os

import yaml

BASE = {
    "training": {
        "L1": False, "batch_size": 64, "n_epochs": 1000000, "n_iters": 3000001,
        "snapshot_freq": 50000, "snapshot_sampling": True, "sample_freq": 50000,
        "val_freq": 100, "log_freq": 50, "log_all_sigmas": False,
        "checkpoint_freq": 1000,
        # fp32 = exact reference parity; "bfloat16" = bf16 score-net fwd+bwd
        # with fp32 master params (+18% step throughput on v5e)
        "compute_dtype": "float32",
        # host->device batch dtype: the tunnel runs ~65MB/s, so float16
        # halves the transfer wall; on-device math is f32 regardless
        # (~1e-4 input quantization, fp32 exact mode: "float32"; "uint8"
        # is LOSSLESS for uint8-sourced video like the KTH/BAIR h5 and 4x
        # smaller — the video configs below use it)
        "wire_dtype": "float16",
        # K train steps per XLA dispatch (lax.scan chunk); 1 = pipelined
        # per-step dispatch (transfer overlaps compute), >1 amortizes
        # dispatch+sync for tiny models. Cadences fire on chunk crossings.
        "steps_per_dispatch": 1,
    },
    "sampling": {
        "batch_size": 100, "data_init": False, "ckpt_id": 0, "final_only": True,
        "fid": False, "ssim": True, "fvd": True, "denoise": True,
        "subsample": 1000, "num_samples4fid": 10000, "num_samples4fvd": 10000,
        "inpainting": False, "interpolation": False, "n_interpolations": 15,
        "consistent": True, "step_lr": 0.0, "n_steps_each": 0, "train": False,
        "num_frames_pred": 20, "clip_before": True, "max_data_iter": 100000,
        "init_prev_t": -1.0, "one_frame_at_a_time": False, "preds_per_test": 1,
    },
    "fast_fid": {
        "batch_size": 1000, "num_samples": 1000, "begin_ckpt": 5000,
        "freq": 5000, "end_ckpt": 300000, "pr_nn_k": 3, "verbose": False,
        "ensemble": False, "step_lr": 0.0, "n_steps_each": 0,
    },
    "test": {"begin_ckpt": 5000, "end_ckpt": 300000, "batch_size": 100},
    "data": {
        "dataset": "StochasticMovingMNIST", "image_size": 64, "channels": 1,
        "logit_transform": False, "uniform_dequantization": False,
        "gaussian_dequantization": False, "random_flip": True, "rescaled": True,
        "num_workers": 0, "num_digits": 2, "step_length": 0.1, "num_frames": 5,
        "num_frames_cond": 5, "num_frames_future": 0, "prob_mask_cond": 0.0,
        "prob_mask_future": 0.0, "prob_mask_sync": False,
    },
    "model": {
        "depth": "deep", "version": "DDPM", "gamma": False, "arch": "unetmore",
        "type": "v1", "time_conditional": True, "dropout": 0.1,
        "sigma_dist": "linear", "sigma_begin": 0.02, "sigma_end": 0.0001,
        "num_classes": 1000, "ema": True, "ema_rate": 0.999, "spec_norm": False,
        "normalization": "InstanceNorm++", "nonlinearity": "swish", "ngf": 64,
        "ch_mult": [1, 2, 3, 4], "num_res_blocks": 2,
        "attn_resolutions": [8, 16, 32], "n_head_channels": 64,
        "conditional": True, "noise_in_cond": False, "output_all_frames": False,
        "cond_emb": False, "spade": False, "spade_dim": 128,
    },
    "optim": {
        "weight_decay": 0.0, "optimizer": "Adam", "lr": 0.0002, "warmup": 1000,
        "beta1": 0.9, "amsgrad": False, "eps": 1e-08, "grad_clip": 1.0,
    },
    # external pretrained feature extractors (runtime downloads in the
    # reference; zero-egress here -> point at local files to activate)
    "eval": {
        "lpips_weights": None, "lpips_alexnet_weights": None,
        "i3d_weights": None, "inception_weights": None,
    },
}


def deep_update(d, u):
    for k, v in u.items():
        if isinstance(v, dict):
            d[k] = deep_update(d.get(k, {}), v)
        else:
            d[k] = v
    return d


BIG = {  # shared "big" video-model settings (kth/bair grid)
    "training": {"val_freq": 1000, "log_freq": 100},
    "sampling": {"subsample": 100, "num_frames_pred": 28},
    "model": {"depth": "deeper", "ngf": 96, "n_head_channels": 96},
    "optim": {"lr": 0.0001, "warmup": 5000},
}

CONFIGS = {
    "smmnist_DDPM_big5": {},
    "smmnist_DDPM_big5_spade": {"model": {"spade": True}},
    "smmnist_DDPM_small5": {
        "data": {"num_frames": 2},
        "model": {"arch": "unet", "ngf": 32, "ch_mult": [1, 2, 2, 2],
                  "num_res_blocks": 1},
    },
    "smmnist_DDPM_small5_3d": {
        "data": {"num_frames": 2},
        "model": {"arch": "unetmore3d", "ngf": 12, "ch_mult": [1, 1, 2, 2, 2],
                  "num_res_blocks": 1, "attn_resolutions": [16],
                  "n_head_channels": -1},
    },
    "kth64_big": deep_update(copy.deepcopy(BIG), {
        # uint8-sourced h5 frames + lossless transforms -> uint8 wire (4x)
        "training": {"wire_dtype": "uint8"},
        "sampling": {"num_frames_pred": 20},
        "data": {"dataset": "KTH", "num_frames_cond": 10},
    }),
    "kth64_big_spade": deep_update(copy.deepcopy(BIG), {
        "training": {"wire_dtype": "uint8"},
        "sampling": {"num_frames_pred": 20},
        "data": {"dataset": "KTH", "num_frames_cond": 10},
        "model": {"spade": True},
    }),
    "bair_big": deep_update(copy.deepcopy(BIG), {
        "training": {"wire_dtype": "uint8"},
        "data": {"dataset": "BAIR", "channels": 3, "color_jitter": 0.0,
                 "test_subset": -1, "num_frames_cond": 2},
    }),
    "bair_big_spade": deep_update(copy.deepcopy(BIG), {
        "training": {"wire_dtype": "uint8"},
        "data": {"dataset": "BAIR", "channels": 3, "color_jitter": 0.0,
                 "test_subset": -1, "num_frames_cond": 2},
        "model": {"spade": True},
    }),
    "bair": deep_update(copy.deepcopy(BIG), {
        "training": {"batch_size": 32},
        "data": {"dataset": "BAIR", "channels": 3, "color_jitter": 0.2,
                 "num_frames": 10, "num_frames_cond": 2},
        "model": {"ngf": 32, "ch_mult": [1, 2, 2, 2], "num_res_blocks": 3,
                  "n_head_channels": 64},
    }),
    # 128px / ngf>=192 configs: add a 2-way 'tensor' (spatial-H) mesh axis —
    # activations at 128px dominate memory; GSPMD shards them and inserts
    # conv halos + norm reductions (tests/test_tensor_parallel.py).
    "cityscapes_big": deep_update(copy.deepcopy(BIG), {
        "training": {"wire_dtype": "uint8"},
        "data": {"dataset": "Cityscapes", "image_size": 128, "channels": 3,
                 "color_jitter": 0.0, "num_frames_cond": 2},
        "model": {"dropout": 0.0, "ngf": 128, "ch_mult": [1, 1, 2, 3, 4],
                  "n_head_channels": 128},
        "parallel": {"tensor": 2},
    }),
    "cityscapes_big_spade": deep_update(copy.deepcopy(BIG), {
        "training": {"batch_size": 32, "wire_dtype": "uint8"},
        "data": {"dataset": "Cityscapes", "image_size": 128, "channels": 3,
                 "color_jitter": 0.0, "num_frames_cond": 2},
        "model": {"dropout": 0.0, "ngf": 192, "ch_mult": [1, 1, 2, 3, 4],
                  "n_head_channels": 192, "spade": True, "spade_dim": 256},
        "parallel": {"tensor": 2},
    }),
    "ucf101": deep_update(copy.deepcopy(BIG), {
        "training": {"wire_dtype": "uint8"},
        "data": {"dataset": "UCF101", "channels": 3, "color_jitter": 0.0,
                 "num_workers": 4, "num_frames": 4, "num_frames_cond": 4},
        "model": {"ngf": 192},
        "parallel": {"tensor": 2},
    }),
    # Legacy image experiments as T=1 unconditional video diffusion. The
    # reference's image configs (configs/cifar10.yml etc.) point at the dead
    # ncsnv2 'arch: ncsn' its own video get_model cannot build
    # (ncsn_runner.py:186-195); here they run through the live unetmore
    # pipeline over mcvd_tpu/data/image_datasets.py.
    "cifar10": {
        "training": {"batch_size": 128},
        "sampling": {"subsample": 100, "num_frames_pred": 1, "fvd": False,
                     "ssim": False, "fid": True},
        "data": {"dataset": "CIFAR10", "image_size": 32, "channels": 3,
                 "rescaled": False, "num_frames": 1, "num_frames_cond": 0,
                 "num_digits": None, "step_length": None},
        "model": {"ngf": 128, "ch_mult": [1, 2, 2, 2], "n_head_channels": 64,
                  "conditional": False},
    },
    "celeba": {
        "training": {"batch_size": 128},
        "sampling": {"subsample": 100, "num_frames_pred": 1, "fvd": False,
                     "ssim": False, "fid": True},
        "data": {"dataset": "CELEBA", "image_size": 64, "channels": 3,
                 "rescaled": False, "num_frames": 1, "num_frames_cond": 0,
                 "num_digits": None, "step_length": None},
        "model": {"ngf": 128, "ch_mult": [1, 2, 2, 2], "n_head_channels": 64,
                  "conditional": False},
    },
    # Smaller 128px cityscapes video config (reference: configs/cityscapes.yml
    # — cityscapes_big with ngf 32, 2 pred frames, batch 32)
    "cityscapes": deep_update(copy.deepcopy(BIG), {
        "training": {"batch_size": 32, "wire_dtype": "uint8"},
        "data": {"dataset": "Cityscapes", "image_size": 128, "channels": 3,
                 "color_jitter": 0.0, "num_frames": 2, "num_frames_cond": 2},
        "model": {"dropout": 0.0, "ngf": 32, "ch_mult": [1, 2, 2, 2],
                  "num_res_blocks": 3, "n_head_channels": 64},
    }),
    # The actual legacy arch the reference's configs/cifar10.yml:68 names but
    # cannot build (models/ncsnv2.py here; published NCSNv2 SMLD recipe:
    # geometric sigmas 50->0.01, 232 levels, 5-step Langevin @ 6.2e-6).
    "cifar10_ncsnv2": {
        "training": {"batch_size": 128},
        "sampling": {"num_frames_pred": 1, "fvd": False, "ssim": False,
                     "fid": True, "n_steps_each": 5, "step_lr": 0.0000062,
                     "final_only": True, "denoise": True},
        "data": {"dataset": "CIFAR10", "image_size": 32, "channels": 3,
                 "rescaled": False, "num_frames": 1, "num_frames_cond": 0,
                 "num_digits": None, "step_length": None},
        "model": {"arch": "ncsnv2", "version": "SMLD",
                  "sigma_dist": "geometric", "sigma_begin": 50.0,
                  "sigma_end": 0.01, "num_classes": 232, "ngf": 128,
                  "nonlinearity": "elu", "normalization": "InstanceNorm++",
                  "conditional": False, "ema": True, "ema_rate": 0.999},
    },
}


def _img_smld(dataset, image_size, sigma_begin, num_classes, step_lr,
              n_steps_each, n_iters, batch_size, sampling_bs, **extra):
    """NCSNv2 SMLD image configs (reference: configs/{bedroom,church,tower,
    ffhq}.yml — the ermongroup/ncsnv2 recipes the repo carries; served here
    as T=1 single-frame video through arch ncsnv2/models/ncsnv2.py, which
    size-dispatches NCSNv2 (<96px) / Deeper (>=96) / Deepest (>=256) like
    the reference's `depth` field implies). The reference's `num_frames_cond:
    5` in tower.yml is a copy-paste vestige of the video grid (the model is
    unconditional, model.conditional: false) — normalized to 0 here."""
    d = {
        "training": {"batch_size": batch_size, "n_iters": n_iters,
                     "val_freq": 100},
        "sampling": {"batch_size": sampling_bs, "num_frames_pred": 1,
                     "fvd": False, "ssim": False, "fid": True,
                     "n_steps_each": n_steps_each, "step_lr": step_lr,
                     "final_only": True, "denoise": True,
                     "n_interpolations": 10, "consistent": False},
        "fast_fid": {"batch_size": 1000, "num_samples": 1000,
                     "step_lr": step_lr, "n_steps_each": n_steps_each,
                     "begin_ckpt": 100000, "end_ckpt": n_iters - 1},
        "test": {"begin_ckpt": 5000, "end_ckpt": n_iters - 1,
                 "batch_size": 100},
        "data": {"dataset": dataset, "image_size": image_size, "channels": 3,
                 "rescaled": False, "num_frames": 1, "num_frames_cond": 0,
                 "num_digits": None, "step_length": None},
        "model": {"arch": "ncsnv2", "version": "SMLD",
                  "sigma_dist": "geometric", "sigma_begin": sigma_begin,
                  "sigma_end": 0.01, "num_classes": num_classes, "ngf": 128,
                  "ch_mult": [1, 2, 2, 2], "num_res_blocks": 1,
                  "nonlinearity": "elu", "normalization": "InstanceNorm++",
                  "conditional": False, "ema": True, "ema_rate": 0.999},
        "optim": {"lr": 0.0001, "warmup": 0},
    }
    return deep_update(d, extra)


CONFIGS.update({
    # LSUN scenes (reference: configs/{bedroom,church,tower}.yml; data via
    # the pure-python LMDB reader, data/lmdb_io.py)
    "bedroom": _img_smld("LSUN", 128, 190.0, 1086, 1.8e-6, 3, 150001, 128, 36,
                         data={"category": "bedroom"}),
    "church": _img_smld("LSUN", 64, 140.0, 788, 4.9e-6, 4, 200001, 128, 96,
                        data={"category": "church_outdoor"}),
    "tower": _img_smld("LSUN", 128, 190.0, 1086, 1.8e-6, 3, 150001, 128, 36,
                       data={"category": "tower"}),
    # FFHQ 256 (reference: configs/ffhq.yml — depth deepest, Adam eps 1e-3)
    "ffhq": _img_smld("FFHQ", 256, 348.0, 2311, 9e-7, 3, 80001, 32, 36,
                      data={"num_workers": 8},
                      optim={"eps": 0.001}),
})


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    os.makedirs(out_dir, exist_ok=True)
    for name, delta in CONFIGS.items():
        cfg = deep_update(copy.deepcopy(BASE), delta)
        path = os.path.join(out_dir, f"{name}.yml")
        with open(path, "w") as f:
            f.write(f"# {name} — generated by tools/gen_configs.py; values mirror\n")
            f.write("# the reference experiment grid for protocol parity.\n")
            yaml.safe_dump(cfg, f, sort_keys=True, default_flow_style=None)
        print("wrote", path)


if __name__ == "__main__":
    main()

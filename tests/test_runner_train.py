"""Runner.train host-loop smoke: pipelined per-step dispatch (wire_dtype
float16) and chunked steps_per_dispatch>1 with a tail chunk, including
cadence-crossing logic (log/val/ckpt) and checkpoint writing.

Reference analog: the NCSNRunner.train loop (ncsn_runner.py:371-418); the
wire/chunk machinery is TPU-tunnel-specific (no reference analog).
"""

import argparse
import os

import numpy as np
import pytest

from mcvd_tpu.config import dict2namespace


def make_cfg(tmp, **training_kw):
    training = {
        "L1": False, "batch_size": 8, "n_epochs": 1, "n_iters": 5,
        "snapshot_freq": 1000, "snapshot_sampling": False, "val_freq": 3,
        "log_freq": 2, "checkpoint_freq": 4, "compute_dtype": "float32",
        "wire_dtype": "float16", "steps_per_dispatch": 1, "sync_every": 2,
    }
    training.update(training_kw)
    d = {
        "data": {
            "channels": 1, "image_size": 64, "num_frames": 2,
            "num_frames_cond": 2, "num_frames_future": 0,
            "logit_transform": False, "rescaled": True, "prob_mask_cond": 0.0,
            "prob_mask_future": 0.0, "prob_mask_sync": False,
            "dataset": "StochasticMovingMNIST", "step_length": 0.1,
            "random_flip": False, "num_digits": 1, "num_workers": 0,
            "subset": 32, "test_subset": 8,
        },
        "model": {
            "arch": "unetmore", "version": "DDPM", "spade": False,
            "cond_emb": False, "time_conditional": True, "dropout": 0.0,
            "sigma_dist": "linear", "sigma_begin": 0.02, "sigma_end": 0.0001,
            "num_classes": 10, "ngf": 8, "ch_mult": [1, 2],
            "num_res_blocks": 1, "attn_resolutions": [8],
            "n_head_channels": 4, "conditional": True, "noise_in_cond": False,
            "output_all_frames": False, "gamma": False, "ema": True,
            "ema_rate": 0.9,
        },
        "training": training,
        "sampling": {"ssim": False, "fvd": False, "subsample": 3,
                     "num_frames_pred": 2, "preds_per_test": 1,
                     "clip_before": True, "batch_size": 8,
                     "one_frame_at_a_time": False, "init_prev_t": -1,
                     "max_data_iter": 1},
        "optim": {"weight_decay": 0.0, "optimizer": "Adam", "lr": 1e-3,
                  "warmup": 0, "beta1": 0.9, "amsgrad": False, "eps": 1e-8,
                  "grad_clip": 1.0},
    }
    return dict2namespace(d)


def make_args(tmp):
    return argparse.Namespace(
        data_path=os.path.join(tmp, "data"), log_path=os.path.join(tmp, "logs"),
        seed=0, resume_training=False, ni=True,
    )


@pytest.mark.parametrize("training_kw,expect_step", [
    ({"steps_per_dispatch": 1, "wire_dtype": "float16"}, 5),
    ({"steps_per_dispatch": 3, "n_iters": 7, "wire_dtype": "float32"}, 7),
])
def test_runner_train_smoke(tmp_path, training_kw, expect_step):
    from mcvd_tpu.runners.runner import Runner

    cfg = make_cfg(str(tmp_path), **training_kw)
    args = make_args(str(tmp_path))
    runner = Runner(args, cfg)
    state = runner.train()
    assert int(state.step) == expect_step  # exact n_iters incl. tail chunk
    # rolling checkpoint written at the end
    assert os.path.isdir(os.path.join(args.log_path, "checkpoint"))
    # params finite
    import jax

    for leaf in jax.tree_util.tree_leaves(state.params):
        assert bool(np.isfinite(np.asarray(leaf)).all())

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

# compile-heavy / subprocess module: excluded from the quick tier
pytestmark = pytest.mark.heavy


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


def test_resume_across_segments_meters_continuity(tmp_path):
    """max_steps_per_run segmentation (the axon H2D-leak workaround) ->
    checkpoint -> --resume_training relaunch: the step counter continues,
    meters survive via meters.pkl, and training finishes exactly at n_iters
    (VERDICT r2 weak #8)."""
    from mcvd_tpu.runners import meters as meters_mod
    from mcvd_tpu.runners.runner import Runner

    cfg = make_cfg(str(tmp_path), n_iters=6, wire_dtype="float32",
                   log_freq=1, val_freq=2, checkpoint_freq=2)
    cfg.training.max_steps_per_run = 3
    args = make_args(str(tmp_path))
    s1 = Runner(args, cfg).train()
    assert int(s1.step) == 3  # segment budget hit

    args2 = make_args(str(tmp_path))
    args2.resume_training = True
    s2 = Runner(args2, cfg).train()
    assert int(s2.step) == 6

    meters = meters_mod.load_meters(args.log_path)
    steps = meters["losses_train"].steps
    # entries from BOTH segments, monotonically increasing, no restart at 0
    assert any(s <= 3 for s in steps) and any(s > 3 for s in steps)
    assert steps == sorted(steps)
    assert meters["losses_test"].steps and meters["losses_test"].count >= 2


def test_uint8_wire_cast_roundtrip():
    """The uint8 wire quantization is bit-lossless for uint8-sourced video
    (k/255 values round-trip exactly through rint(x*255)/255)."""
    from mcvd_tpu.data.loader import prefetch_to_device

    x = (np.arange(256, dtype=np.float32) / 255.0).reshape(1, 16, 16)
    out = list(prefetch_to_device(iter([(x, None)]), wire_dtype=np.uint8))
    wired, _ = out[0]
    assert wired.dtype == np.uint8
    np.testing.assert_array_equal(wired.astype(np.float32) / 255.0, x)


def test_uint8_wire_path(tmp_path):
    """wire_dtype=uint8 end-to-end: batches travel as uint8 (4x fewer
    tunnel bytes); the step converts /255 on device and training tracks the
    float32-wire run closely on the same data (VERDICT r2 weak #8 — the
    uint8 wire had only drive evidence). SMMNIST sprites are bilinear-
    resized (not k/255-exact), so parity is approximate here."""
    import jax

    from mcvd_tpu.runners import meters as meters_mod
    from mcvd_tpu.runners.runner import Runner

    first_loss = {}
    for wire in ("float32", "uint8"):
        tmp = tmp_path / wire
        tmp.mkdir()
        cfg = make_cfg(str(tmp), wire_dtype=wire, n_iters=2, log_freq=1)
        args = make_args(str(tmp))
        state = Runner(args, cfg).train()
        assert int(state.step) == 2
        leaves = jax.tree_util.tree_leaves(state.params)
        assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
        first_loss[wire] = meters_mod.load_meters(
            args.log_path)["losses_train"].vals[0]
    # same seed => same batch/noise; only the input quantization differs
    np.testing.assert_allclose(first_loss["uint8"], first_loss["float32"],
                               rtol=0.05)

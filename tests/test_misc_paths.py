"""Remaining option paths: noise_in_cond, output_all_frames+all_frames loss,
one_frame_at_a_time autoregression."""

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import dsm_loss, make_schedule
from mcvd_tpu.models import get_model
import pytest


def make_config(**model_kw):
    d = {
        "data": {
            "channels": 1, "image_size": 16, "num_frames": 2,
            "num_frames_cond": 2, "num_frames_future": 0,
            "logit_transform": False, "rescaled": True,
        },
        "model": {
            "arch": "unetmore", "version": "DDPM", "spade": False,
            "cond_emb": False, "time_conditional": True, "dropout": 0.0,
            "sigma_dist": "linear", "sigma_begin": 0.02, "sigma_end": 0.0001,
            "num_classes": 10, "ngf": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
            "attn_resolutions": [8], "n_head_channels": 4, "conditional": True,
            "noise_in_cond": False, "output_all_frames": False, "gamma": False,
            "ema": False, "ema_rate": 0.999,
        },
        "sampling": {"subsample": 3, "num_frames_pred": 4, "denoise": True,
                     "clip_before": True, "one_frame_at_a_time": False,
                     "init_prev_t": -1, "ssim": True, "fvd": False,
                     "preds_per_test": 1, "max_data_iter": 1},
    }
    d["model"].update(model_kw)
    return dict2namespace(d)


@pytest.mark.heavy
def test_noise_in_cond_forward_and_loss():
    config = make_config(noise_in_cond=True)
    model = get_model(config)
    sched = make_schedule(config)
    B = 2
    x = jnp.zeros((B, 16, 16, 2)); cond = jnp.ones((B, 16, 16, 2))
    y = jnp.array([1, 5], jnp.int32)
    # sched is a trace-time constant (numpy tables), so it rides in closures
    # like the train step does — not through the jit boundary
    params = jax.jit(
        lambda k, x, y, c: model.init(k, x, y, c, None, sched=sched,
                                      rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), x, y, cond)
    out = jax.jit(
        lambda p, x, y, c: model.apply(p, x, y, c, sched=sched,
                                       rng=jax.random.PRNGKey(2))
    )(params, x, y, cond)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
    # noise_in_cond actually perturbs cond: different rng -> different output
    out2 = model.apply(params, x, y, cond, sched=sched, rng=jax.random.PRNGKey(3))
    assert float(jnp.abs(out2 - out).max()) > 0


def test_output_all_frames_with_all_frames_loss():
    # all_frames loss concatenates cond into the target and passes cond=None
    # (reference: losses/dsm.py:13-15); with cond=None the concat model
    # treats the full folded stack as input.
    config = make_config(output_all_frames=True)
    # out conv still emits num_frames*C (reference behavior); the all_frames
    # loss path is exercised for the folded input
    sched = make_schedule(config)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 2), np.float32)
    cond = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, 2), np.float32)
    model = get_model(config)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.concatenate([x, cond], -1),
        jnp.zeros((2,), jnp.int32), None, None,
    )

    def model_fn(xt, labels, c, m):
        out = model.apply(params, xt, labels, c, m)
        # reference's mismatch quirk: output has num_frames*C channels while
        # the all_frames target has n_frames*C; pad with zeros for the test
        pad = xt.shape[-1] - out.shape[-1]
        return jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, pad)))

    loss = dsm_loss(jax.random.PRNGKey(0), model_fn, x, sched, cond=cond,
                    all_frames=True)
    assert np.isfinite(float(loss))


def test_one_frame_at_a_time_autoregression():
    from mcvd_tpu.eval.video_gen import autoregressive_predict, make_block_sampler

    config = make_config()
    config.sampling.one_frame_at_a_time = True
    model = get_model(config)
    sched = make_schedule(config)
    B = 2
    x = jnp.zeros((B, 16, 16, 2)); cond = jnp.zeros((B, 16, 16, 2))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond, None
    )["params"]
    block = make_block_sampler(config, model, sched)
    pred = autoregressive_predict(
        config, block, params, jax.random.PRNGKey(1), cond, None, 3, 0, sched
    )
    # 3 frames predicted one at a time, truncated to num_frames_pred*C
    assert pred.shape == (B, 16, 16, 3)
    assert bool(jnp.isfinite(pred).all())


def test_snapshot_code(tmp_path):
    """Train-start self-archival (reference copy_scripts, main.py:333-356):
    full package + configs + entry scripts land in <exp>/code, with the git
    SHA recorded."""
    import importlib.util, os, sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "mcvd_main", os.path.join(root, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    dst = mod.snapshot_code(str(tmp_path / "exp"))
    assert os.path.isfile(os.path.join(dst, "main.py"))
    assert os.path.isfile(os.path.join(dst, "mcvd_tpu", "runners", "runner.py"))
    assert os.path.isdir(os.path.join(dst, "configs"))
    assert not os.path.isdir(os.path.join(dst, "mcvd_tpu", "__pycache__"))
    with open(os.path.join(dst, "GIT_STATE")) as f:
        assert f.readline().startswith("commit: ")

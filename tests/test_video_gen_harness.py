"""video_gen 3-pass harness on a tiny model: interp+pred+gen taxonomy
(reference: ncsn_runner.py video_gen passes 1-3)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import make_schedule
from mcvd_tpu.eval.video_gen import run_video_gen, slide_cond_window
from mcvd_tpu.models import get_model

import pytest

# compile-heavy / subprocess module: excluded from the quick tier
pytestmark = pytest.mark.heavy


def make_config(future=0, pmc=0.0, pmf=0.0):
    return dict2namespace({
        "data": {
            "channels": 1, "image_size": 16, "num_frames": 2,
            "num_frames_cond": 2, "num_frames_future": future,
            "logit_transform": False, "rescaled": True,
            "prob_mask_cond": pmc, "prob_mask_future": pmf,
            "prob_mask_sync": False, "dataset": "StochasticMovingMNIST",
        },
        "model": {
            "arch": "unetmore", "version": "DDPM", "spade": False,
            "cond_emb": pmc > 0, "time_conditional": True, "dropout": 0.0,
            "sigma_dist": "linear", "sigma_begin": 0.02, "sigma_end": 0.0001,
            "num_classes": 10, "ngf": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
            "attn_resolutions": [8], "n_head_channels": 4, "conditional": True,
            "noise_in_cond": False, "output_all_frames": False, "gamma": False,
            "ema": False, "ema_rate": 0.999,
        },
        "sampling": {
            "ssim": True, "fvd": True, "subsample": 3, "num_frames_pred": 4,
            "preds_per_test": 2, "clip_before": True, "denoise": True,
            "max_data_iter": 1, "batch_size": 4, "one_frame_at_a_time": False,
            "init_prev_t": -1,
        },
    })


def fake_embedder(videos):
    # stand-in for I3D: cheap pooled features
    v = np.asarray(videos)
    return v.reshape(len(v), -1)[:, :16].astype(np.float64)


def _loader(config, B=4):
    T = config.data.num_frames_cond + config.data.num_frames + getattr(
        config.data, "num_frames_future", 0
    )
    # need pred window too
    T = max(T, config.data.num_frames_cond + config.sampling.num_frames_pred
            + getattr(config.data, "num_frames_future", 0))
    X = np.random.RandomState(0).rand(B, T, 16, 16, 1).astype(np.float32)
    return [(X, np.zeros(B))]


def _run(config):
    model = get_model(config)
    sched = make_schedule(config)
    B = 4
    x = jnp.zeros((B, 16, 16, config.data.num_frames))
    Fc = config.data.num_frames_cond + config.data.num_frames_future
    cond = jnp.zeros((B, 16, 16, Fc))
    y = jnp.zeros((B,), jnp.int32)
    cm = jnp.ones((B,), jnp.int32) if config.model.cond_emb else None
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond, cm)["params"]
    return run_video_gen(
        config, model, params, sched, iter(_loader(config)),
        jax.random.PRNGKey(0), preds_per_test=config.sampling.preds_per_test,
        i3d_embedder=fake_embedder,
    )


def test_pure_prediction_with_fvd():
    vm = _run(make_config())
    assert {"mse", "psnr", "ssim", "fvd"} <= set(vm)
    assert np.isfinite(vm["mse"]) and np.isfinite(vm["fvd"])


def test_interp_pred_gen_all_passes():
    # condp>0, future>0, futrp>0, no sync -> passes 1+2+3
    vm = _run(make_config(future=1, pmc=0.5, pmf=0.5))
    assert "mse" in vm and "mse2" in vm, vm.keys()  # pass 1 + pass 2
    assert "fvd3" in vm  # pass 3 (uncond gen)
    for k in ("mse", "mse2", "fvd3"):
        assert np.isfinite(vm[k])


def test_ensemble_block_sampler_averages_eps():
    """ensemble=True averages score-network OUTPUTS across stacked param
    trees inside the sampler (reference fast_ensemble_fid semantics,
    ncsn_runner.py:2616-2630) — verified against a hand-built mean-eps
    closure run through the same sampler."""
    from mcvd_tpu.diffusion import samplers as samplers_mod
    from mcvd_tpu.eval.video_gen import make_block_sampler

    config = make_config()
    model = get_model(config)
    sched = make_schedule(config)
    B = 2
    x = jnp.zeros((B, 16, 16, config.data.num_frames))
    cond = jnp.zeros((B, 16, 16, config.data.num_frames_cond))
    y = jnp.zeros((B,), jnp.int32)
    p1 = jax.jit(model.init)(jax.random.PRNGKey(1), x, y, cond)["params"]
    p2 = jax.jit(model.init)(jax.random.PRNGKey(2), x, y, cond)["params"]
    stacked = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), p1, p2)

    key = jax.random.PRNGKey(3)
    init = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    got = make_block_sampler(config, model, sched, ensemble=True)(
        stacked, key, init, cond, None
    )

    def mean_eps(xx, labels):
        e1 = model.apply({"params": p1}, xx, labels, cond, None, sched=sched)
        e2 = model.apply({"params": p2}, xx, labels, cond, None, sched=sched)
        return 0.5 * (e1 + e2)

    want = samplers_mod.ddpm_sampler(
        key, init, mean_eps, sched,
        subsample_steps=config.sampling.subsample, final_only=True,
        denoise=True, clip_before=True, t_min=-1,
    )[-1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_block_sampler_bf16_compute_dtype():
    """sampling.compute_dtype='bfloat16' runs the score network in bf16
    (sampler chain math stays fp32) and stays close to the fp32 result."""
    from mcvd_tpu.eval.video_gen import make_block_sampler

    config = make_config()
    model = get_model(config)
    sched = make_schedule(config)
    B = 2
    x = jnp.zeros((B, 16, 16, config.data.num_frames))
    cond = jax.random.normal(jax.random.PRNGKey(5),
                             (B, 16, 16, config.data.num_frames_cond))
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x, y, cond)["params"]
    key = jax.random.PRNGKey(2)
    init = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    f32 = make_block_sampler(config, model, sched)(params, key, init, cond, None)
    config.sampling.compute_dtype = "bfloat16"
    bf16 = make_block_sampler(config, model, sched)(params, key, init, cond, None)
    assert bf16.dtype == jnp.float32  # chain math stays fp32
    assert np.isfinite(np.asarray(bf16)).all()
    # same chain, reduced-precision eps: outputs stay close after clipping
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               rtol=0.2, atol=0.2)


def test_slide_cond_window_future_aware():
    config = make_config(future=1)
    B, sz, C = 2, 4, 1
    Fc, F, fut = 2, 2, 1
    cond = jnp.arange(B * sz * sz * (Fc + fut) * C, dtype=jnp.float32).reshape(
        B, sz, sz, (Fc + fut) * C
    )
    gen = -jnp.ones((B, sz, sz, F * C))
    out = slide_cond_window(config, cond, gen, fut, one_frame=False)
    assert out.shape == cond.shape
    # future channel (last) preserved verbatim
    np.testing.assert_allclose(np.asarray(out[..., -1]), np.asarray(cond[..., -1]))
    # past channels replaced by last Fc frames of gen
    np.testing.assert_allclose(np.asarray(out[..., 0]), -1.0)

"""Shape/finiteness smoke tests for every model family
(reference coverage: ncsnpp_more.py NCSNpp/SPADE_NCSNpp 2d/3d/pseudo3d,
models/unet.py legacy UNet)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.models import get_model


def make_config(arch="unetmore", spade=False, cond_emb=False, version="DDPM",
                num_frames=2, num_frames_cond=2, num_frames_future=0,
                image_size=16, ngf=16, channels=1):
    return dict2namespace(
        {
            "data": {
                "channels": channels,
                "image_size": image_size,
                "num_frames": num_frames,
                "num_frames_cond": num_frames_cond,
                "num_frames_future": num_frames_future,
                "logit_transform": False,
                "rescaled": True,
            },
            "model": {
                "arch": arch,
                "version": version,
                "spade": spade,
                "spade_dim": 32,
                "cond_emb": cond_emb,
                "time_conditional": True,
                "dropout": 0.1,
                "sigma_dist": "linear",
                "sigma_begin": 0.02,
                "sigma_end": 0.0001,
                "num_classes": 20,
                "ngf": ngf,
                "ch_mult": [1, 2],
                "num_res_blocks": 1,
                "attn_resolutions": [8],
                "n_head_channels": 8,
                "conditional": True,
                "noise_in_cond": False,
                "output_all_frames": False,
                "gamma": False,
                "ema": True,
                "ema_rate": 0.999,
            },
        }
    )


def run_forward(config, B=2):
    model = get_model(config)
    C = config.data.channels
    F = config.data.num_frames
    Fc = config.data.num_frames_cond + config.data.num_frames_future
    sz = config.data.image_size
    x = jnp.asarray(np.random.RandomState(0).randn(B, sz, sz, F * C), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(1).randn(B, sz, sz, Fc * C), jnp.float32)
    y = jnp.array([3, 7], dtype=jnp.int32)
    cond_mask = jnp.array([1, 0], dtype=jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond, cond_mask)
    out = jax.jit(model.apply)(params, x, y, cond, cond_mask)
    assert out.shape == (B, sz, sz, F * C), out.shape
    assert bool(jnp.isfinite(out).all())
    return params, out


# Note: forward parity for all 7 architecture variants (incl. SPADE, 3D,
# pseudo3D, cond_emb, legacy UNet) is covered against reference goldens in
# test_torch_parity.py; here only configurations NOT exercised there.
@pytest.mark.parametrize(
    "arch,spade",
    [
        ("unetmore3d", True),  # 3D+SPADE: no golden (reference pairing exists)
    ],
)
def test_ncsnpp_variants(arch, spade):
    run_forward(make_config(arch=arch, spade=spade))


def test_future_frames():
    run_forward(make_config(num_frames_future=1))


def test_full3d_attn_variant():
    """model.full3d_attn swaps the factorized 3D attention for the full
    joint space-time block (reference layers3d.py:139 AttnBlockpp3d_old,
    abandoned+broken upstream; parity in test_blocks_parity.py)."""
    config = make_config(arch="unetmore3d")
    config.model.full3d_attn = True
    params, _ = run_forward(config)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("att" in jax.tree_util.keystr(k) for k, _ in flat)


def test_init_scale_zero_output():
    """Final conv is zero-init (init_scale=0 -> 1e-10): output ~ 0 at init."""
    config = make_config()
    _, out = run_forward(config)
    assert float(jnp.abs(out).max()) < 1e-4

"""Legacy norm zoo parity + specialty Langevin sampler smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import make_schedule
from mcvd_tpu.diffusion.langevin_extras import (
    anneal_langevin_inpainting,
    anneal_langevin_interpolation,
    sparse_anneal_langevin,
)
from mcvd_tpu.models.normalization import InstanceNorm2dPlus, get_normalization


def test_instance_norm_plus_matches_torch():
    B, C, H, W = 3, 8, 6, 6
    g = torch.Generator().manual_seed(0)
    x = torch.randn(B, C, H, W, generator=g)
    alpha = torch.randn(C, generator=g) * 0.02 + 1
    gamma = torch.randn(C, generator=g) * 0.02 + 1
    beta = torch.randn(C, generator=g) * 0.1

    # torch oracle (reference: normalization.py:157-184)
    means = x.mean(dim=(2, 3))
    m = means.mean(dim=-1, keepdim=True)
    v = means.var(dim=-1, keepdim=True)
    means_n = (means - m) / torch.sqrt(v + 1e-5)
    inorm = torch.nn.functional.instance_norm(x, eps=1e-5)
    h = inorm + means_n[..., None, None] * alpha[..., None, None]
    ref = gamma.view(1, C, 1, 1) * h + beta.view(1, C, 1, 1)

    mod = InstanceNorm2dPlus(num_features=C)
    params = {
        "params": {
            "alpha": jnp.asarray(alpha.numpy() - 1.0),
            "gamma": jnp.asarray(gamma.numpy() - 1.0),
            "beta": jnp.asarray(beta.numpy()),
        }
    }
    got = mod.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref.numpy(), rtol=1e-4, atol=1e-5
    )


def _smld_sched():
    return make_schedule(dict2namespace({"model": {
        "version": "SMLD", "sigma_dist": "geometric", "sigma_begin": 1.0,
        "sigma_end": 0.01, "num_classes": 4, "gamma": False}}))


def eps_fn(x, labels):
    return 0.1 * x


def test_inpainting_sampler_keeps_known_half_noised():
    sched = _smld_sched()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    ref_img = jnp.ones((2, 8, 8, 3)) * 0.5
    out = anneal_langevin_inpainting(key, x, ref_img, eps_fn, sched, n_steps_each=2)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())


def test_interpolation_sampler_shape():
    sched = _smld_sched()
    out = anneal_langevin_interpolation(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)), eps_fn, sched, 5,
        n_steps_each=2,
    )
    assert out.shape == (10, 8, 8, 1) and bool(jnp.isfinite(out).all())


def test_sparse_sampler_shape():
    sched = _smld_sched()
    out = sparse_anneal_langevin(
        jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)), 0.5, eps_fn, sched,
        n_steps_each=2,
    )
    assert out.shape == (2, 8, 8, 1) and bool(jnp.isfinite(out).all())


def test_get_normalization_dispatch():
    cfg = dict2namespace({"model": {"normalization": "InstanceNorm++", "num_classes": 10}})
    assert get_normalization(cfg) is InstanceNorm2dPlus
    cond = get_normalization(cfg, conditional=True)
    mod = cond(num_features=8)
    x = jnp.zeros((2, 4, 4, 8))
    y = jnp.array([1, 3])
    p = mod.init(jax.random.PRNGKey(0), x, y)
    out = mod.apply(p, x, y)
    assert out.shape == x.shape

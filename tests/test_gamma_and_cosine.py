"""Gamma-noise loss/sampler paths and cosine-schedule training path."""

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import dsm_loss, make_schedule
from mcvd_tpu.diffusion.samplers import ddpm_sampler


def cfg(gamma=True, dist="linear"):
    return dict2namespace(
        {
            "model": {
                "version": "DDPM", "sigma_dist": dist, "sigma_begin": 0.02,
                "sigma_end": 0.0001, "num_classes": 20, "gamma": gamma,
            }
        }
    )


def eps_fn(x, labels, cond=None, cond_mask=None):
    return 0.1 * x


def test_gamma_dsm_loss_finite():
    sched = make_schedule(cfg(gamma=True))
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 2), jnp.float32)
    loss = jax.jit(
        lambda k, x: dsm_loss(k, eps_fn, x, sched, gamma=True)
    )(jax.random.PRNGKey(0), x)
    assert np.isfinite(float(loss))


def test_gamma_ddpm_sampler_finite():
    sched = make_schedule(cfg(gamma=True))
    out = jax.jit(
        lambda k, x: ddpm_sampler(k, x, lambda x, t: 0.1 * x, sched,
                                  subsample_steps=5, gamma=True)
    )(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)))
    assert bool(jnp.isfinite(out).all())


def test_cosine_schedule_train_path():
    sched = make_schedule(cfg(gamma=False, dist="cosine"))
    assert sched.betas is not None and sched.alphas[0] < sched.alphas[-1]
    x = jnp.asarray(np.random.RandomState(1).rand(4, 8, 8, 2), jnp.float32)
    loss = jax.jit(lambda k, x: dsm_loss(k, eps_fn, x, sched))(
        jax.random.PRNGKey(1), x
    )
    assert np.isfinite(float(loss))


def test_l1_and_all_frames_loss():
    sched = make_schedule(cfg(gamma=False))
    x = jnp.asarray(np.random.RandomState(2).rand(4, 8, 8, 2), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(3).rand(4, 8, 8, 2), jnp.float32)
    l1 = dsm_loss(jax.random.PRNGKey(0), eps_fn, x, sched, cond=cond, L1=True)
    af = dsm_loss(jax.random.PRNGKey(0), eps_fn, x, sched, cond=cond,
                  all_frames=True)
    assert np.isfinite(float(l1)) and np.isfinite(float(af))

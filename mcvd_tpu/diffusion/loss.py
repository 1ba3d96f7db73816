"""Denoising score-matching training loss.

Reference: losses/dsm.py:7-52 (`anneal_dsm_score_estimation`). Functional JAX
version: explicit PRNG key, model passed as an apply closure, labels optional.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule


def dsm_loss(
    key: jax.Array,
    model_fn: Callable[..., jnp.ndarray],
    x: jnp.ndarray,
    sched: DiffusionSchedule,
    *,
    labels: Optional[jnp.ndarray] = None,
    cond: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    gamma: bool = False,
    L1: bool = False,
    all_frames: bool = False,
) -> jnp.ndarray:
    """DSM loss, mean over batch of sum over per-example dims of
    0.5*(z - model(x_t, t))^2 (or |.| if L1).

    `model_fn(x_t, labels, cond, cond_mask)` returns predicted noise z.
    DDPM-family: x_t = sqrt(abar_t) x + sqrt(1-abar_t) z with t ~ U{0..T-1}.
    SMLD: x_t = x + sigma_t z.
    `all_frames` concatenates cond into the target along channels and drops
    cond conditioning (reference: losses/dsm.py:13-15); channels are the LAST
    axis here (NHWC).
    """
    key_t, key_z = jax.random.split(key)
    B = x.shape[0]

    if all_frames and cond is not None:
        x = jnp.concatenate([x, cond], axis=-1)
        cond = None

    bshape = (B,) + (1,) * (x.ndim - 1)

    if sched.version == "SMLD":
        sigmas = jnp.asarray(sched.sigmas)
        if labels is None:
            labels = jax.random.randint(key_t, (B,), 0, len(sched.sigmas))
        used = sigmas[labels].reshape(bshape)
        z = jax.random.normal(key_z, x.shape, dtype=x.dtype)
        perturbed = x + used * z
    else:
        alphas = jnp.asarray(sched.alphas)
        if labels is None:
            labels = jax.random.randint(key_t, (B,), 0, len(sched.alphas))
        used = alphas[labels].reshape(bshape)
        if gamma:
            k = jnp.asarray(sched.k_cum)[labels].reshape(bshape)
            theta = jnp.asarray(sched.theta_t)[labels].reshape(bshape)
            g = jax.random.gamma(key_z, jnp.broadcast_to(k, x.shape)) * theta
            z = (g - k * theta) / jnp.sqrt(1.0 - used)
        else:
            z = jax.random.normal(key_z, x.shape, dtype=x.dtype)
        perturbed = jnp.sqrt(used) * x + jnp.sqrt(1.0 - used) * z

    pred = model_fn(perturbed, labels, cond, cond_mask)
    diff = (z - pred).reshape(B, -1)
    if L1:
        per_example = jnp.abs(diff).sum(axis=-1)
    else:
        per_example = 0.5 * jnp.square(diff).sum(axis=-1)
    return per_example.mean()

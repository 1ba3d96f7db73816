"""Specialty SMLD Langevin samplers: inpainting, interpolation, sparse.

Reference: models/__init__.py:413-483 (sparse), :581-677 (sparse consistent),
:680-716 (inpainting), :719-771 (interpolation). These are legacy ncsnv2
image-path features; kept for capability parity. All are jittable with
explicit keys.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def anneal_langevin_inpainting(
    key: jax.Array,
    x_mod: jnp.ndarray,          # (B*n_samples, H, W, C) init noise
    refer_image: jnp.ndarray,    # (B*n_samples, H, W, C)
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    n_steps_each: int = 100,
    step_lr: float = 0.000008,
) -> jnp.ndarray:
    """Left-half-known inpainting (reference: models/__init__.py:680-716):
    each inner step overwrites the known half with a freshly-noised copy of
    the reference image, then takes a Langevin step."""
    sigmas = jnp.asarray(sched.sigmas)
    L = len(sched.sigmas)
    W = x_mod.shape[2]
    cols = W // 2
    B = x_mod.shape[0]
    keys = jax.random.split(key, L * n_steps_each).reshape(L, n_steps_each, -1)

    def level(x, sc):
        c, sigma, level_keys = sc
        labels = jnp.full((B,), c, dtype=jnp.int32)
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def inner(x, k):
            k1, k2 = jax.random.split(k)
            corrupted = refer_image[:, :, :cols] + jax.random.normal(
                k1, refer_image[:, :, :cols].shape
            ) * sigma
            x = x.at[:, :, :cols].set(corrupted)
            noise = jax.random.normal(k2, x.shape) * jnp.sqrt(step_size * 2.0)
            grad = eps_fn(x, labels)
            # reference uses +step*grad here (score convention of ncsnv2)
            x = x + step_size * grad + noise
            return x, 0.0

        x, _ = jax.lax.scan(inner, x, level_keys)
        return x, 0.0

    cs = jnp.arange(L, dtype=jnp.int32)
    x, _ = jax.lax.scan(level, x_mod, (cs, sigmas, keys))
    return x


def anneal_langevin_interpolation(
    key: jax.Array,
    x_mod: jnp.ndarray,          # (B, H, W, C)
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    n_interpolations: int,
    *,
    n_steps_each: int = 200,
    step_lr: float = 0.000008,
) -> jnp.ndarray:
    """Slerp-noise interpolation sampling (reference: models/__init__.py:719-771):
    each row is driven by cos/sin-mixed noise pairs across n_interpolations."""
    sigmas = jnp.asarray(sched.sigmas)
    L = len(sched.sigmas)
    B, H, W, C = x_mod.shape
    x = jnp.repeat(x_mod[:, None], n_interpolations, axis=1).reshape(-1, H, W, C)
    angles = jnp.linspace(0, np.pi / 2.0, n_interpolations)
    keys = jax.random.split(key, L * n_steps_each).reshape(L, n_steps_each, -1)

    def level(x, sc):
        c, sigma, level_keys = sc
        labels = jnp.full((x.shape[0],), c, dtype=jnp.int32)
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def inner(x, k):
            k1, k2 = jax.random.split(k)
            noise_p = jax.random.normal(k1, (B, H, W, C))
            noise_q = jax.random.normal(k2, (B, H, W, C))
            noise = (
                noise_p[:, None] * jnp.cos(angles)[None, :, None, None, None]
                + noise_q[:, None] * jnp.sin(angles)[None, :, None, None, None]
            ).reshape(-1, H, W, C)
            grad = eps_fn(x, labels)
            x = x + step_size * grad + noise * jnp.sqrt(step_size * 2.0)
            return x, 0.0

        x, _ = jax.lax.scan(inner, x, level_keys)
        return x, 0.0

    cs = jnp.arange(L, dtype=jnp.int32)
    x, _ = jax.lax.scan(level, x, (cs, sigmas, keys))
    return x


def sparse_anneal_langevin(
    key: jax.Array,
    x_mod_sparse: jnp.ndarray,
    sparsity: float,
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    n_steps_each: int = 200,
    step_lr: float = 0.000008,
    denoise: bool = True,
) -> jnp.ndarray:
    """Sparse variant (reference: models/__init__.py:413-483): a dense chain
    x is simulated while the sparse iterate takes 1/sparsity-scaled gradient
    steps and sparsity-scaled noise."""
    sigmas = jnp.asarray(sched.sigmas)
    L = len(sched.sigmas)
    B = x_mod_sparse.shape[0]
    keys = jax.random.split(key, L * n_steps_each).reshape(L, n_steps_each, -1)

    def level(carry, sc):
        x, xs = carry
        c, sigma, level_keys = sc
        labels = jnp.full((B,), c, dtype=jnp.int32)
        step_size = step_lr * (sigma / sigmas[-1]) ** 2

        def inner(carry, k):
            x, xs = carry
            grad = eps_fn(x, labels)
            noise = jax.random.normal(k, x.shape)
            x = x - step_size / sigma * grad + jnp.sqrt(step_size * 2.0) * noise
            xs = xs - step_size / sigma * (grad / sparsity) + jnp.sqrt(
                step_size * 2.0
            ) * (sparsity * noise)
            return (x, xs), 0.0

        (x, xs), _ = jax.lax.scan(inner, (x, xs), level_keys)
        return (x, xs), 0.0

    cs = jnp.arange(L, dtype=jnp.int32)
    (x, xs), _ = jax.lax.scan(level, (x_mod_sparse, x_mod_sparse), (cs, sigmas, keys))
    if denoise:
        labels = jnp.full((B,), L - 1, dtype=jnp.int32)
        xs = xs - sigmas[-1] * sparsity * eps_fn(x, labels)
    return xs

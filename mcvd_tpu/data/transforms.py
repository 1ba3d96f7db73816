"""Data transforms (reference: datasets/__init__.py:228-261) in jnp.

All ops are elementwise and jit-safe; dequantization takes an explicit key.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def logit_transform(image: jnp.ndarray, lam: float = 1e-6) -> jnp.ndarray:
    image = lam + (1 - 2 * lam) * image
    return jnp.log(image) - jnp.log1p(-image)


def data_transform(config, X: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
    data = config.data
    if getattr(data, "uniform_dequantization", False):
        assert key is not None
        X = X / 256.0 * 255.0 + jax.random.uniform(key, X.shape, dtype=X.dtype) / 256.0
    if getattr(data, "gaussian_dequantization", False):
        assert key is not None
        X = X + jax.random.normal(key, X.shape, dtype=X.dtype) * 0.01
    if getattr(data, "rescaled", False):
        X = 2 * X - 1.0
    elif getattr(data, "logit_transform", False):
        X = logit_transform(X)
    return X


def inverse_data_transform(config, X: jnp.ndarray) -> jnp.ndarray:
    data = config.data
    if getattr(data, "logit_transform", False):
        X = jax.nn.sigmoid(X)
    elif getattr(data, "rescaled", False):
        X = (X + 1.0) / 2.0
    return jnp.clip(X, 0.0, 1.0)

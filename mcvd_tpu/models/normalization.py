"""Legacy NCSNv1/v2 normalization zoo (reference: models/better/normalization.py).

These are vestigial for the video models (NCSN++ uses GroupNorm/SPADE) but
part of the capability surface: InstanceNorm++, VarianceNorm, and the
class-conditional variants used by the legacy `ncsn` archs. NHWC layouts;
torch var of means uses the unbiased estimator — matched here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _instance_norm(x, eps=1e-5):  # (B,H,W,C), stats per (B,C) over H,W
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _normalized_channel_means(x):
    """Per-channel spatial means, normalized across channels (the '++' part:
    reintroduces relative channel magnitudes lost to instance norm)."""
    means = x.mean(axis=(1, 2))                        # (B, C)
    m = means.mean(axis=-1, keepdims=True)
    v = means.var(axis=-1, keepdims=True, ddof=1)      # torch default: unbiased
    return (means - m) / jnp.sqrt(v + 1e-5)


class InstanceNorm2dPlus(nn.Module):
    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = self.num_features
        alpha = self.param("alpha", nn.initializers.normal(0.02), (C,)) + 1.0
        gamma = self.param("gamma", nn.initializers.normal(0.02), (C,)) + 1.0
        means = _normalized_channel_means(x)
        h = _instance_norm(x) + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (C,))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        C = self.num_features
        n = 3 if self.bias else 2
        embed = nn.Embed(
            self.num_classes, C * n,
            embedding_init=nn.initializers.normal(0.02), name="embed",
        )
        e = embed(y) + jnp.concatenate(
            [jnp.ones((C * 2,)), jnp.zeros((C,))] if self.bias else [jnp.ones((C * 2,))]
        )
        means = _normalized_channel_means(x)
        h = _instance_norm(x)
        if self.bias:
            gamma, alpha, beta = jnp.split(e, 3, axis=-1)
            h = h + means[:, None, None, :] * alpha[:, None, None, :]
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma, alpha = jnp.split(e, 2, axis=-1)
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


class VarianceNorm2d(nn.Module):
    """Scale-only instance norm (reference: normalization.py VarianceNorm2d)."""

    num_features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.normal(0.02), (self.num_features,)) + 1.0
        var = x.var(axis=(1, 2), keepdims=True)
        return alpha * x * jax.lax.rsqrt(var + 1e-5)


def get_normalization(config, conditional: bool = False):
    """Reference: normalization.py:22-40."""
    norm = getattr(config.model, "normalization", "InstanceNorm++")
    if conditional:
        if norm == "InstanceNorm++":
            import functools

            return functools.partial(
                ConditionalInstanceNorm2dPlus, num_classes=config.model.num_classes
            )
        raise NotImplementedError(f"{norm} conditional not implemented")
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        from .layers import GroupNorm

        return GroupNorm
    raise ValueError(f"Unknown normalization: {norm}")

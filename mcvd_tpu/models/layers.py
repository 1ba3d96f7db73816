"""Core layer utilities: initializers, time embedding, NIN, group norm.

Everything is NHWC (TPU-native conv layout); the reference is NCHW torch
(models/better/layers.py). Weight-init semantics match the reference exactly:
`default_init` is variance_scaling(scale, fan_avg, uniform) — the reference
itself ported that from JAX (models/better/layers.py:43-81), so we use
jax.nn.initializers.variance_scaling directly.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def default_init(scale: float = 1.0):
    """DDPM initializer (reference: models/better/layers.py:77-81)."""
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_act(config=None) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Reference: models/better/layers.py:29-31 — always SiLU."""
    return jax.nn.silu


def num_groups_for(ch: int) -> int:
    """GroupNorm group count rule used everywhere in the reference
    (e.g. models/better/layerspp.py:215-217): min(ch//4, 32), decremented
    until it divides ch."""
    g = min(ch // 4, 32)
    if g < 1:
        return 1
    while ch % g != 0:
        g -= 1
    return g


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    *,
    eps: float = 1e-6,
    gamma: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
    frames_last: int = 1,
) -> jnp.ndarray:
    """Functional group norm over NHWC (or NHW(C*N) pseudo-5D) tensors.

    For the 3D model family the torch reference normalizes (B, C, N, H, W)
    with groups splitting the true channel dim C (layerspp.py get_act_norm
    is3d path); here the last axis holds C*N channel-major, so pass
    frames_last=N and the stats reduce over (H, W, group-channels, N).

    This is also the lax reference implementation for the Pallas fused
    GN+affine+act kernel (ops/groupnorm.py).
    """
    y, _, _ = group_norm_folded(x, num_groups, eps=eps, gamma=gamma,
                                beta=beta, frames_last=frames_last)
    return y


@functools.lru_cache(maxsize=None)
def _gn_group_matrix(CN: int, G: int, frames_last: int) -> np.ndarray:
    """One-hot (CN, G): channel-major folded index c*N+n -> group of c."""
    C = CN // frames_last
    cg = C // G
    M = np.zeros((CN, G), np.float32)
    for idx in range(CN):
        M[idx, (idx // frames_last) // cg] = 1.0
    return M


def group_norm_folded(
    x: jnp.ndarray,
    num_groups: int,
    *,
    eps: float = 1e-6,
    gamma: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,   # (B, CN) AdaGN
    shift: Optional[jnp.ndarray] = None,
    frames_last: int = 1,
    act: bool = False,
):
    """GroupNorm(+affine)(+AdaGN)(+SiLU) with XLA-friendly structure.

    Stats run as MXU dots (sum over spatial via a ones-vector contraction,
    then channel->group via a one-hot matrix) instead of VPU reshape/reduce
    chains, and the whole normalize/affine/AdaGN tail is folded into ONE
    per-(b,channel) FMA `x*A + B` — a pure elementwise op XLA fuses into the
    consuming conv's input, with no layout constraints (a pallas kernel here
    forces {3,2,1,0} relayouts around every conv; see tools/profile_trace.py).
    Returns (y, A, B)."""
    orig_dtype = x.dtype
    B = x.shape[0]
    CN = x.shape[-1]
    G = num_groups
    S = int(np.prod(x.shape[1:-1]))
    M = jnp.asarray(_gn_group_matrix(CN, G, frames_last))

    # Precision.HIGHEST: on TPU the default matmul precision truncates f32
    # operands to bf16 (~0.4% per term), and the one-pass E[x^2]-mean^2
    # variance amplifies that via cancellation — these dots must accumulate
    # in true f32 or the documented "stats in fp32" guarantee silently
    # degrades on the target backend (ADVICE r2). Cost is negligible: norms
    # are ~0.29ms of a 4.1ms eval (BENCH_NOTES.md).
    hi = jax.lax.Precision.HIGHEST
    xf = x.reshape(B, S, CN).astype(jnp.float32)
    ones = jnp.ones((S,), jnp.float32)
    s1c = jnp.einsum("bsc,s->bc", xf, ones, precision=hi)  # (B, CN) on the MXU
    s2c = jnp.einsum("bsc,s->bc", xf * xf, ones, precision=hi)
    n = S * (CN // G)
    s1g = jnp.matmul(s1c, M, precision=hi)              # (B, G)
    s2g = jnp.matmul(s2c, M, precision=hi)
    mean_g = s1g / n
    var_g = s2g / n - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    A = jnp.matmul(rstd_g, M.T, precision=hi)           # (B, CN)
    Bc = jnp.matmul(-mean_g * rstd_g, M.T, precision=hi)
    if gamma is not None:
        g = jnp.repeat(gamma, frames_last) if frames_last > 1 else gamma
        b = jnp.repeat(beta, frames_last) if frames_last > 1 else beta
        A = A * g
        Bc = Bc * g + b
    if scale is not None:
        e = 1.0 + scale.astype(jnp.float32)
        A = A * e
        Bc = Bc * e + shift.astype(jnp.float32)
    y = x.astype(jnp.float32) * A[:, None, :].reshape(
        (B, *([1] * (x.ndim - 2)), CN)) + Bc[:, None, :].reshape(
        (B, *([1] * (x.ndim - 2)), CN))
    if act:
        y = jax.nn.silu(y)
    return y.astype(orig_dtype), A, Bc


class GroupNorm(nn.Module):
    """GroupNorm module matching torch nn.GroupNorm semantics on NHWC."""

    channels: int
    eps: float = 1e-6
    affine: bool = True
    frames_last: int = 1  # >1: treat last axis as C*N (3D family)

    @nn.compact
    def __call__(self, x):
        C = self.channels  # true channels (without frame folding)
        G = num_groups_for(C)
        gamma = beta = None
        if self.affine:
            gamma = self.param("scale", nn.initializers.ones, (C,))
            beta = self.param("bias", nn.initializers.zeros, (C,))
        from .. import ops as _ops  # lazy: ops.groupnorm imports this module

        if _ops.use_pallas("groupnorm") and x.ndim == 4:
            return _ops.groupnorm.fused_group_norm(
                x, G, eps=self.eps, gamma=gamma, beta=beta,
                frames_last=self.frames_last,
            )
        return group_norm(
            x, G, eps=self.eps, gamma=gamma, beta=beta, frames_last=self.frames_last
        )


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference: models/better/layers.py:504-519)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class NIN(nn.Module):
    """Per-pixel channel mixing (reference: models/better/layers.py:535-545).
    On NHWC this is a plain trailing-axis contraction — MXU-friendly."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        in_dim = x.shape[-1]
        W = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        if return_params:
            # caller fuses several NIN matmuls into one (AttnBlock qkv
            # projection); param path/shape identical to the plain call
            return W, b
        return jnp.tensordot(x, W, axes=1) + b


class Conv2d(nn.Module):
    """3x3/1x1 conv with DDPM init on NHWC (reference: layers.py:89-118)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    init_scale: float = 1.0
    bias: bool = True
    padding: object = "SAME"  # "SAME" | "VALID" | explicit

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.out_ch,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=self.bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
        )(x)


def conv3x3(out_ch: int, init_scale: float = 1.0, stride: int = 1, bias: bool = True):
    return Conv2d(out_ch=out_ch, kernel=3, stride=stride, init_scale=init_scale, bias=bias)


def conv1x1(out_ch: int, init_scale: float = 1.0, stride: int = 1, bias: bool = True):
    return Conv2d(out_ch=out_ch, kernel=1, stride=stride, init_scale=init_scale, bias=bias)


class GaussianFourierProjection(nn.Module):
    """Fourier noise-level embedding (reference: layerspp.py:176-184)."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        W = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
    """StyleGAN2 fused bias+LeakyReLU+scale. TPU equivalent of the reference
    CUDA kernel (models/better/op/fused_bias_act_kernel.cu) — XLA fuses this
    elementwise chain into neighbours, no custom kernel needed."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale

"""Fused GroupNorm(+AdaGN scale/shift)(+activation) Pallas kernel.

The BigGAN resblock spends two full GroupNorm+affine+SiLU passes per block
(reference: layerspp.py get_act_norm); unfused that is ~6 HBM round-trips of
the activation tensor. This kernel does stats + normalize + AdaGN + SiLU in
ONE read + ONE write per tensor.

Group stats are computed on the MXU via a one-hot channel->group matrix
(jnp.dot over the lane axis) instead of reshaping lanes — reshapes that split
the 128-lane dimension are expensive on TPU; matmuls are free throughput here.

Layout: NHWC (or folded NHW(C*N)); grid over batch. Falls back to the lax
reference (models/layers.py group_norm) when the per-example tensor exceeds
the VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import group_norm as group_norm_reference  # lax reference

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _group_matrix(CN: int, num_groups: int, frames_last: int) -> np.ndarray:
    """One-hot (CN, G): channel index (channel-major c*N+n) -> group of its
    true channel c."""
    C = CN // frames_last
    cg = C // num_groups
    M = np.zeros((CN, num_groups), np.float32)
    for idx in range(CN):
        c = idx // frames_last
        M[idx, c // cg] = 1.0
    return M


def _kernel(x_ref, M_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
            *, eps: float, act: bool, n_per_group: int, has_emb: bool,
            has_affine: bool):
    b = pl.program_id(0)
    x = x_ref[0]                      # (H, W, CN)
    H, W, CN = x.shape
    xf = x.reshape(H * W, CN)
    M = M_ref[:]                      # (CN, G)
    # per-group sums via MXU
    s1 = jnp.dot(xf.sum(axis=0, keepdims=True), M,
                 preferred_element_type=jnp.float32)          # (1, G)
    s2 = jnp.dot(jnp.sum(xf * xf, axis=0, keepdims=True), M,
                 preferred_element_type=jnp.float32)          # (1, G)
    mean_g = s1 / n_per_group
    var_g = s2 / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back per channel: (1,G) @ (G,CN)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (1, CN)
    rstd_c = jnp.dot(rstd_g, M.T, preferred_element_type=jnp.float32)
    y = (xf - mean_c) * rstd_c
    if has_affine:
        y = y * gamma_ref[:] + beta_ref[:]
    if has_emb:
        y = y * (1.0 + scale_ref[b]) + shift_ref[b]
    if act:
        y = y * jax.nn.sigmoid(y)     # SiLU
    o_ref[0] = y.reshape(H, W, CN)


def fused_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    *,
    eps: float = 1e-5,
    gamma: Optional[jnp.ndarray] = None,   # (C,) true channels
    beta: Optional[jnp.ndarray] = None,
    scale: Optional[jnp.ndarray] = None,   # (B, CN) AdaGN
    shift: Optional[jnp.ndarray] = None,
    frames_last: int = 1,
    act: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm(+affine)(+AdaGN)(+SiLU) over (B, H, W, CN)."""
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, W, CN = x.shape
    bytes_needed = H * W * CN * 4 * 2
    if bytes_needed > VMEM_BUDGET_BYTES:
        out = group_norm_reference(
            x, num_groups, eps=eps, gamma=gamma, beta=beta, frames_last=frames_last
        )
        if scale is not None:
            out = out * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        if act:
            out = jax.nn.silu(out)
        return out

    M = jnp.asarray(_group_matrix(CN, num_groups, frames_last))
    C = CN // frames_last
    n_per_group = H * W * (C // num_groups) * frames_last

    has_affine = gamma is not None
    if has_affine:
        g_cn = jnp.repeat(gamma, frames_last) if frames_last > 1 else gamma
        b_cn = jnp.repeat(beta, frames_last) if frames_last > 1 else beta
    else:
        g_cn = jnp.ones((CN,), x.dtype)
        b_cn = jnp.zeros((CN,), x.dtype)
    has_emb = scale is not None
    if not has_emb:
        scale = jnp.zeros((B, CN), x.dtype)
        shift = jnp.zeros((B, CN), x.dtype)

    kernel = functools.partial(
        _kernel, eps=eps, act=act, n_per_group=n_per_group,
        has_emb=has_emb, has_affine=has_affine,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, CN), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CN, num_groups), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CN,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CN,), lambda b: (0,), memory_space=pltpu.VMEM),
            # full (B, CN) blocks: per-row blocks violate TPU (8,128) tiling
            pl.BlockSpec((B, CN), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CN), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, CN), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, M, g_cn, b_cn, scale, shift)

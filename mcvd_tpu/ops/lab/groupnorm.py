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

from ...models.layers import group_norm as group_norm_reference  # lax reference

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
    x = x_ref[0]                      # (H, W, CN) — no reshape copies: keep
    M = M_ref[:]                      # the working set at ~in+out+1 temp
    # stats in fp32 regardless of input dtype (bf16 sums over H*W would lose
    # precision); per-channel sums over (H, W), then per-group via MXU
    xf = x.astype(jnp.float32)
    s1 = jnp.dot(xf.sum(axis=(0, 1))[None, :], M,
                 preferred_element_type=jnp.float32)          # (1, G)
    s2 = jnp.dot(jnp.sum(xf * xf, axis=(0, 1))[None, :], M,
                 preferred_element_type=jnp.float32)          # (1, G)
    mean_g = s1 / n_per_group
    var_g = s2 / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast back per channel: (1,G) @ (G,CN), applied along lanes
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)[0]  # (CN,)
    rstd_c = jnp.dot(rstd_g, M.T, preferred_element_type=jnp.float32)[0]
    # fold normalize+affine+AdaGN into ONE per-channel FMA: y = A*x + B.
    # The kernel is VPU-bound (tools/profile_gn2.py), so collapsing the
    # elementwise chain is the main win; A/B are (CN,) vectors, cheap.
    A = rstd_c
    Bc = -mean_c * rstd_c
    if has_affine:
        A = A * gamma_ref[:]
        Bc = Bc * gamma_ref[:] + beta_ref[:]
    if has_emb:
        e = 1.0 + scale_ref[b]
        A = A * e
        Bc = Bc * e + shift_ref[b]
    # one FMA in fp32 (Mosaic's bf16 logistic is unsupported; the fold from
    # ~10 elementwise ops to FMA+SiLU is the VPU win)
    y = x * A + Bc
    if act:
        y = y * jax.nn.sigmoid(y)     # SiLU
    o_ref[0] = y.astype(o_ref.dtype)


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
    """GroupNorm(+affine)(+AdaGN)(+SiLU) over (B, H, W, CN).

    Differentiable: a custom VJP (closed-form GN backward, jnp math XLA
    fuses fine — the forward fusion is where the HBM win is) makes the
    kernel usable in training, not just eval."""
    return _fused_group_norm_diff(
        x,
        gamma if gamma is not None else _NONE,
        beta if beta is not None else _NONE,
        scale if scale is not None else _NONE,
        shift if shift is not None else _NONE,
        num_groups=num_groups, eps=eps, frames_last=frames_last, act=act,
        interpret=interpret,
    )


# sentinel standing in for None so custom_vjp sees a fixed pytree structure
_NONE = np.zeros((0,), np.float32)


def _is_none(v) -> bool:
    return isinstance(v, np.ndarray) and v.size == 0 or (
        hasattr(v, "size") and v.size == 0
    )


import functools as _ft


@_ft.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _fused_group_norm_diff(x, gamma, beta, scale, shift, num_groups, eps,
                           frames_last, act, interpret):
    return _fused_group_norm_impl(
        x,
        None if _is_none(gamma) else gamma,
        None if _is_none(beta) else beta,
        None if _is_none(scale) else scale,
        None if _is_none(shift) else shift,
        num_groups=num_groups, eps=eps, frames_last=frames_last, act=act,
        interpret=interpret,
    )


def _gn_stats(x, num_groups, frames_last, eps):
    """x_hat, rstd (per (B, G)) via the lax reference layout math."""
    B = x.shape[0]
    CN = x.shape[-1]
    C = CN // frames_last
    xr = x.reshape(B, -1, num_groups, C // num_groups, frames_last)
    mean = xr.mean(axis=(1, 3, 4), keepdims=True)
    var = xr.var(axis=(1, 3, 4), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    x_hat = ((xr - mean) * rstd).reshape(x.shape)
    return x_hat, xr, mean, rstd


def _fgn_fwd(x, gamma, beta, scale, shift, num_groups, eps, frames_last, act,
             interpret):
    out = _fused_group_norm_diff(x, gamma, beta, scale, shift, num_groups, eps,
                                 frames_last, act, interpret)
    return out, (x, gamma, beta, scale, shift)


def _fgn_bwd(num_groups, eps, frames_last, act, interpret, res, g):
    x, gamma, beta, scale, shift = res
    B = x.shape[0]
    CN = x.shape[-1]
    has_affine = not _is_none(gamma)
    has_emb = not _is_none(scale)

    x_hat, xr, mean, rstd = _gn_stats(x, num_groups, frames_last, eps)

    g_cn = (jnp.repeat(gamma, frames_last) if frames_last > 1 else gamma) if has_affine else None
    b_cn = (jnp.repeat(beta, frames_last) if frames_last > 1 else beta) if has_affine else None

    # u = pre-activation; a = d u / d x_hat (per b, cn)
    a = jnp.ones((1, CN), x.dtype)
    if has_affine:
        a = a * g_cn
    if has_emb:
        a = a * (1.0 + scale)
    a = a[:, None, None, :] if a.ndim == 2 else a.reshape(1, 1, 1, CN)

    if act:
        affine_part = x_hat * (g_cn if has_affine else 1.0) + (b_cn if has_affine else 0.0)
        u = affine_part
        if has_emb:
            u = u * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        sig = jax.nn.sigmoid(u)
        dz = g * (sig + u * sig * (1 - sig))
    else:
        dz = g

    # grads for the tail params
    d_gamma = d_beta = d_scale = d_shift = None
    if has_emb:
        affine_part = x_hat * (g_cn if has_affine else 1.0) + (b_cn if has_affine else 0.0)
        d_scale = jnp.sum(dz * affine_part, axis=(1, 2))
        d_shift = jnp.sum(dz, axis=(1, 2))
        dz_aff = dz * (1.0 + scale[:, None, None, :])
    else:
        dz_aff = dz
    if has_affine:
        d_g_cn = jnp.sum(dz_aff * x_hat, axis=(0, 1, 2))
        d_b_cn = jnp.sum(dz_aff, axis=(0, 1, 2))
        if frames_last > 1:
            C = CN // frames_last
            d_gamma = d_g_cn.reshape(C, frames_last).sum(-1)
            d_beta = d_b_cn.reshape(C, frames_last).sum(-1)
        else:
            d_gamma, d_beta = d_g_cn, d_b_cn
        dxh = dz_aff * g_cn
    else:
        dxh = dz_aff

    # GN backward per group
    C = CN // frames_last
    dxh_r = dxh.reshape(B, -1, num_groups, C // num_groups, frames_last)
    xh_r = x_hat.reshape(B, -1, num_groups, C // num_groups, frames_last)
    m1 = dxh_r.mean(axis=(1, 3, 4), keepdims=True)
    m2 = (dxh_r * xh_r).mean(axis=(1, 3, 4), keepdims=True)
    dx = (rstd * (dxh_r - m1 - xh_r * m2)).reshape(x.shape)

    return (
        dx,
        d_gamma if d_gamma is not None else _NONE,
        d_beta if d_beta is not None else _NONE,
        d_scale if d_scale is not None else _NONE,
        d_shift if d_shift is not None else _NONE,
    )


_fused_group_norm_diff.defvjp(_fgn_fwd, _fgn_bwd)


def _stats_kernel(x_ref, M_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (Ht, W, CN); stats always in fp32
    M = M_ref[:]
    s1 = jnp.dot(x.sum(axis=(0, 1))[None, :], M,
                 preferred_element_type=jnp.float32)
    s2 = jnp.dot(jnp.sum(x * x, axis=(0, 1))[None, :], M,
                 preferred_element_type=jnp.float32)
    o_ref[0, 0] = jnp.concatenate([s1, s2], axis=0)  # (2, G)


def _norm_kernel(x_ref, mean_ref, rstd_ref, gamma_ref, beta_ref, scale_ref,
                 shift_ref, o_ref, *, act: bool, has_emb: bool,
                 has_affine: bool):
    b = pl.program_id(0)
    x = x_ref[0]
    A = rstd_ref[b]
    Bc = -mean_ref[b] * rstd_ref[b]
    if has_affine:
        A = A * gamma_ref[:]
        Bc = Bc * gamma_ref[:] + beta_ref[:]
    if has_emb:
        e = 1.0 + scale_ref[b]
        A = A * e
        Bc = Bc * e + shift_ref[b]
    y = x * A + Bc
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_h_tile(H: int, W: int, CN: int, budget: int = 1 << 20) -> int:
    """Largest divisor of H with tile bytes <= budget."""
    for ht in range(H, 0, -1):
        if H % ht == 0 and ht * W * CN * 4 <= budget:
            return ht
    return 1


def _fused_group_norm_tiled(x, gamma, beta, scale, shift, *, num_groups, eps,
                            frames_last, act, interpret):
    """Two-pass tiled variant for blocks too large for the single-pass
    kernel: pass 1 accumulates per-(b, h-tile) group sums, stats combine in
    XLA (tiny), pass 2 normalizes tile-wise. Handles arbitrarily large
    activations (e.g. Cityscapes 128x128) with ~1MB tiles."""
    B, H, W, CN = x.shape
    C = CN // frames_last
    G = num_groups
    M = jnp.asarray(_group_matrix(CN, G, frames_last))
    Ht = _pick_h_tile(H, W, CN)
    n_tiles = H // Ht

    partial = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 2, G), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Ht, W, CN), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CN, G), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, G), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, M)

    n_per_group = H * W * (C // G) * frames_last
    s = partial.sum(axis=1)               # (B, 2, G)
    mean_g = s[:, 0] / n_per_group        # (B, G)
    var_g = s[:, 1] / n_per_group - mean_g**2
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = mean_g @ M.T                 # (B, CN)
    rstd_c = rstd_g @ M.T

    has_affine = gamma is not None
    if has_affine:
        g_cn = jnp.repeat(gamma, frames_last) if frames_last > 1 else gamma
        b_cn = jnp.repeat(beta, frames_last) if frames_last > 1 else beta
    else:
        g_cn = jnp.ones((CN,), x.dtype)
        b_cn = jnp.zeros((CN,), x.dtype)
    has_emb = scale is not None
    if not has_emb:
        scale = jnp.zeros((B, CN), jnp.float32)
        shift = jnp.zeros((B, CN), jnp.float32)
    else:
        scale = scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)

    kernel = functools.partial(_norm_kernel, act=act, has_emb=has_emb,
                               has_affine=has_affine)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, Ht, W, CN), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CN), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CN), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CN,), lambda b, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((CN,), lambda b, t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CN), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CN), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ht, W, CN), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, mean_c, rstd_c, g_cn, b_cn, scale, shift)


# single-pass kernel needs ~8x the block size in scoped VMEM; beyond this the
# two-pass tiled variant takes over
SINGLE_PASS_MAX_BLOCK = int(1.5 * 1024 * 1024)


def _fused_group_norm_impl(
    x: jnp.ndarray,
    gamma,
    beta,
    scale,
    shift,
    *,
    num_groups: int,
    eps: float,
    frames_last: int,
    act: bool,
    interpret: bool,
) -> jnp.ndarray:
    interpret = interpret or jax.default_backend() == "cpu"
    _, H_, W_, CN_ = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    if H_ * W_ * CN_ * itemsize > SINGLE_PASS_MAX_BLOCK:
        return _fused_group_norm_tiled(
            x, gamma, beta, scale, shift, num_groups=num_groups, eps=eps,
            frames_last=frames_last, act=act, interpret=interpret,
        )
    B, H, W, CN = x.shape
    bytes_needed = H * W * CN * itemsize * 2
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
        scale = jnp.zeros((B, CN), jnp.float32)
        shift = jnp.zeros((B, CN), jnp.float32)
    else:
        # row-indexed (scale_ref[b]) blocks must be fp32: Mosaic can't prove
        # dynamic row alignment under bf16's (16, 128) tiling
        scale = scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)

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
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, M, g_cn, b_cn, scale, shift)

"""Fused spatial self-attention Pallas kernel.

The NCSN++ attention operates on <=32x32 spatial tokens with head dim 64
(reference: layerspp.py:207-249); the whole (T,T) score matrix for T<=1024
fits in VMEM, so a single-block fused kernel (qk^T -> softmax -> @v, no HBM
round-trip for scores) is the right shape — full flash-style kv tiling only
pays off beyond the resolutions these models use, and the lax fallback covers
those.

Grid: (B*heads,). Inputs (BH, T, D); D padded to 128 lanes by the caller if
needed (64 is handled natively).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_SCORE_LIMIT = 2048  # max T for the single-block kernel


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (T, D)
    k = k_ref[0]
    v = v_ref[0]
    # scores + softmax in f32 regardless of input dtype (bf16 inputs are the
    # fast path; the reduction math stays full precision)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (T, T)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, interpret: bool = False) -> jnp.ndarray:
    """(BH, T, D) -> (BH, T, D). Falls back to lax for T beyond the VMEM
    single-block limit. Differentiable: custom VJP with the standard
    softmax-attention backward in XLA einsums (recomputes P; the forward
    kernel fusion is where the win is)."""
    return _fused_attention_fwd_impl(q, k, v, scale, interpret)


def _fused_attention_fwd_impl(q, k, v, scale, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    BH, T, D = q.shape
    if T > VMEM_SCORE_LIMIT:
        s = jnp.einsum("btd,bsd->bts", q, k) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bts,bsd->btd", p, v)

    kernel = functools.partial(_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v)


def _fa_fwd(q, k, v, scale, interpret):
    return _fused_attention_fwd_impl(q, k, v, scale, interpret), (q, k, v)


def _fa_bwd(scale, interpret, res, g):
    q, k, v = res
    s = jnp.einsum("btd,bsd->bts", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bts,btd->bsd", p, g)
    dp = jnp.einsum("btd,bsd->bts", g, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bts,bsd->btd", ds, k) * scale
    dk = jnp.einsum("bts,btd->bsd", ds, q) * scale
    return dq, dk, dv


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def attention_reference(q, k, v, scale):
    """lax reference (same math as blocks.AttnBlock einsums)."""
    s = jnp.einsum("btd,bsd->bts", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bts,bsd->btd", p, v)


# ---------------------------------------------------------------------------
# v2: packed-heads q-blocked kernel.
#
# Takes q/k/v in the natural (B, T, C) layout straight out of the qkv
# projection (C = n_heads * head_dim) — no host-side (B,T,h,d)->(Bh,T,d)
# transposes, which cost more e2e than the kernel saved (+0.23ms measured).
# Heads are handled with in-kernel lane slices; the grid is (B, T//Tq) so
# Mosaic's cross-step pipelining overlaps the exp/softmax VPU work of one
# q-block with the matmuls of the next. k/v block index maps are constant in
# the q dimension, so their DMAs are skipped on revisit.
# ---------------------------------------------------------------------------


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_heads: int,
                   head_dim: int):
    q = q_ref[0]  # (Tq, C)
    k = k_ref[0]  # (T, C)
    v = v_ref[0]
    outs = []
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jnp.dot(q[:, sl], k[:, sl].T,
                    preferred_element_type=jnp.float32) * scale  # (Tq, T)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(v.dtype), v[:, sl],
                            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           n_heads: int, scale: float,
                           interpret: bool = False) -> jnp.ndarray:
    """(B, T, C) -> (B, T, C) multi-head attention, C = n_heads*head_dim.

    Forward runs the packed-heads Pallas kernel; backward is the standard
    softmax-attention VJP in XLA einsums (eval is the hot path)."""
    return _packed_fwd_impl(q, k, v, n_heads, scale, interpret)


def _packed_reference(q, k, v, n_heads, scale):
    B, T, C = q.shape
    d = C // n_heads
    qh = q.reshape(B, T, n_heads, d)
    kh = k.reshape(B, T, n_heads, d)
    vh = v.reshape(B, T, n_heads, d)
    s = jnp.einsum("bthd,bshd->bhts", qh, kh) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p, vh)
    return o.reshape(B, T, C)


def _packed_fwd_impl(q, k, v, n_heads, scale, interpret):
    interpret = interpret or jax.default_backend() == "cpu"
    B, T, C = q.shape
    d = C // n_heads
    if T > VMEM_SCORE_LIMIT:
        return _packed_reference(q, k, v, n_heads, scale)
    Tq = min(T, 256)
    if T % Tq:
        Tq = T
    kernel = functools.partial(_packed_kernel, scale=scale, n_heads=n_heads,
                               head_dim=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(B, T // Tq),
        in_specs=[
            pl.BlockSpec((1, Tq, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v)


def _packed_fwd(q, k, v, n_heads, scale, interpret):
    return _packed_fwd_impl(q, k, v, n_heads, scale, interpret), (q, k, v)


def _packed_bwd(n_heads, scale, interpret, res, g):
    q, k, v = res
    B, T, C = q.shape
    d = C // n_heads
    qh = q.reshape(B, T, n_heads, d)
    kh = k.reshape(B, T, n_heads, d)
    vh = v.reshape(B, T, n_heads, d)
    gh = g.reshape(B, T, n_heads, d)
    s = jnp.einsum("bthd,bshd->bhts", qh, kh) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhts,bthd->bshd", p, gh)
    dp = jnp.einsum("bthd,bshd->bhts", gh, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bshd->bthd", ds, kh) * scale
    dk = jnp.einsum("bhts,bthd->bshd", ds, qh) * scale
    return (dq.reshape(B, T, C), dk.reshape(B, T, C), dv.reshape(B, T, C))


fused_attention_packed.defvjp(_packed_fwd, _packed_bwd)

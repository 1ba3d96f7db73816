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

#!/usr/bin/env python
"""Microbench the flagship's three attention shapes across implementations:
XLA einsum chain, our single-block fused kernel (ops/attention.py), and the
upstream pallas flash_attention op. Shapes are (B, heads, T, D) from the
64x64 flagship: 32x32 C=128 h=2, 16x16 C=192 h=3, 8x8 C=256 h=4, D=64.

N dependent iterations inside one jitted lax.scan (axon dispatch latency).
"""

import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from mcvd_tpu.ops.lab.attention import (attention_reference, fused_attention,
                                    fused_attention_packed, _packed_reference)


def bench(label, fn, args, N=200):
    @jax.jit
    def run(a0):
        def f(c, _):
            o = fn(c, *args[1:])
            return o.astype(c.dtype), ()
        c, _ = jax.lax.scan(f, a0, None, length=N)
        return c

    t0 = time.time()
    out = run(args[0])
    _ = float(jnp.sum(out))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        out = run(out)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / (3 * N) * 1e3
    print(f"  {label:28s} {dt:7.3f} ms  (compile {comp:.0f}s)", flush=True)
    return dt


def main():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    dtype = jnp.bfloat16
    for (res, C, h) in [(32, 128, 2), (16, 192, 3), (8, 256, 4)]:
        B, T, D = 16, res * res, 64
        print(f"res={res} B={B} h={h} T={T} D={D} {dtype.__name__}")
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, h, T, D), dtype)
        k = jax.random.normal(key, (B, h, T, D), dtype)
        v = jax.random.normal(key, (B, h, T, D), dtype)
        scale = D ** -0.5

        def xla(q, k, v):
            return attention_reference(
                q.reshape(B * h, T, D), k.reshape(B * h, T, D),
                v.reshape(B * h, T, D), scale).reshape(B, h, T, D)

        def ours(q, k, v):
            return fused_attention(
                q.reshape(B * h, T, D), k.reshape(B * h, T, D),
                v.reshape(B * h, T, D), scale).reshape(B, h, T, D)

        def flash(q, k, v):
            return fa.flash_attention(q, k, v, sm_scale=scale)

        # packed layout (B, T, C): what blocks.py actually has in hand
        qp = jax.random.normal(key, (B, T, C), dtype)
        kp = jax.random.normal(key, (B, T, C), dtype)
        vp = jax.random.normal(key, (B, T, C), dtype)

        def xla_packed(q, k, v):
            return _packed_reference(q, k, v, h, scale)

        def packed(q, k, v):
            return fused_attention_packed(q, k, v, h, scale)

        bench("xla einsum", xla, (q, k, v))
        bench("ours single-block", ours, (q, k, v))
        bench("xla packed-layout", xla_packed, (qp, kp, vp))
        bench("packed-heads kernel", packed, (qp, kp, vp))
        try:
            bench("upstream flash", flash, (q, k, v))
        except Exception as e:
            print(f"  upstream flash FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

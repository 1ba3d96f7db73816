#!/usr/bin/env python
"""Microbenchmark the flagship model's conv shapes on TPU (bf16).

The axon tunnel has ~10ms per-dispatch latency, so each measurement runs
N=100 dependent conv applications inside ONE jitted lax.scan and divides.
Reports achieved TFLOP/s and % of v5e bf16 peak per shape, plus a
space-to-depth rewrite of the 64x64 level.

Usage: python tools/profile_convs.py [batch]
"""

import sys
import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # TPU v5e
N = 100


def timeit_scan(make_body, x0, label, flops_per_iter, n_outer=3):
    """make_body() -> body(x) with same in/out shape; scans N iters in one jit."""
    body = make_body()

    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), ()
        c, _ = jax.lax.scan(f, x, None, length=N)
        return c

    out = run(x0)
    _ = float(jnp.sum(out))  # axon: block via dependent transfer
    t0 = time.time()
    for _ in range(n_outer):
        out = run(out)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / (n_outer * N)
    tfs = flops_per_iter / dt / 1e12
    print(f"{label:34s}: {dt*1e6:8.1f} us {tfs:6.1f} TF/s "
          f"({100*tfs/(PEAK_BF16/1e12):4.1f}% peak)", flush=True)
    return dt


def bench_conv(B, H, W, C, k=3, dtype=jnp.bfloat16, label=""):
    """Self-feeding CxC conv."""
    x = jnp.asarray(np.random.rand(B, H, W, C), dtype)
    w = jnp.asarray(np.random.randn(k, k, C, C), dtype) * (0.5 / (k * k * C) ** 0.5)

    def make():
        def body(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return body

    flops = 2 * k * k * B * H * W * C * C
    return timeit_scan(make, x, label or f"{B}x{H}x{W}x{C}->{C} k{k}", flops)


def bench_concat_conv(B, H, W, Cin, Cout, label=""):
    """Conv Cin->Cout then channel-tile back to Cin (up-path concat shape)."""
    assert Cin % Cout == 0
    x = jnp.asarray(np.random.rand(B, H, W, Cin), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(3, 3, Cin, Cout), jnp.bfloat16) * (
        0.5 / (9 * Cin) ** 0.5)

    def make():
        def body(x):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.concatenate([y] * (Cin // Cout), axis=-1)
        return body

    flops = 2 * 9 * B * H * W * Cin * Cout
    return timeit_scan(make, x, label or f"{B}x{H}x{W}x{Cin}->{Cout} concat", flops)


def bench_s2d(B, H, W, C, dtype=jnp.bfloat16):
    """L0 conv in space-to-depth form: (B,H/2,W/2,4C) self-feeding 2x2 conv
    (the structured equivalent of the 3x3 direct conv; 16/9 FLOP overhead)."""
    nH, nW = H // 2, W // 2
    x = jnp.asarray(np.random.rand(B, nH, nW, 4 * C), dtype)
    w = jnp.asarray(np.random.randn(2, 2, 4 * C, 4 * C), dtype) * (
        0.5 / (4 * 4 * C) ** 0.5)

    def make():
        def body(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return body

    useful = 2 * 9 * B * H * W * C * C  # the direct conv it replaces
    dt = timeit_scan(make, x, f"s2d {B}x{nH}x{nW}x{4*C} k2", useful)
    return dt


def bench_matmul(M, K, Nc, dtype=jnp.bfloat16):
    """MXU sanity ceiling: self-feeding square-ish matmul."""
    x = jnp.asarray(np.random.rand(M, K), dtype)
    w = jnp.asarray(np.random.randn(K, Nc), dtype) * (1.0 / K**0.5)
    w2 = jnp.asarray(np.random.randn(Nc, K), dtype) * (1.0 / Nc**0.5)

    def make():
        def body(x):
            return (x @ w) @ w2
        return body

    flops = 2 * M * K * Nc * 2
    return timeit_scan(make, x, f"matmul {M}x{K}x{Nc} x2", flops)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"# backend={jax.default_backend()} B={B} bf16 scan({N})", flush=True)
    bench_matmul(8192, 512, 512)
    d0 = bench_conv(B, 64, 64, 64, label="L0 body 64x64x64")
    bench_conv(B, 32, 32, 128, label="L1 body 32x32x128")
    bench_conv(B, 16, 16, 192, label="L2 body 16x16x192")
    bench_conv(B, 8, 8, 256, label="L3 body 8x8x256")
    bench_concat_conv(B, 64, 64, 128, 64, label="L0 up 128->64")
    bench_concat_conv(B, 32, 32, 256, 128, label="L1 up 256->128")
    ds = bench_s2d(B, 64, 64, 64)
    print(f"# s2d vs direct L0: {ds/d0:.2f}x time", flush=True)
    bench_conv(B, 64, 64, 64, dtype=jnp.float32, label="L0 body fp32")
    bench_conv(B, 64, 64, 128, label="L0 at 128ch (lane-fill ref)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Marginal cost of one fused GroupNorm(+AdaGN+SiLU) at the flagship model's
shapes, pallas vs XLA-reference, bf16. Chains k normalizations per scan
iteration and reports (t_k2 - t_k1)/(k2 - k1) — scan overhead cancels.

Usage: python tools/profile_gn.py
"""

import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.models.layers import group_norm as xla_group_norm
from mcvd_tpu.ops.lab.groupnorm import fused_group_norm

N = 30
K1, K2 = 1, 5


def marginal(fn, x, scale, shift, label):
    def run_k(k):
        @jax.jit
        def run(x):
            def f(c, _):
                y = c
                for _ in range(k):
                    y = fn(y, scale, shift)
                return y.astype(c.dtype), ()
            c, _ = jax.lax.scan(f, x, None, length=N)
            return c

        out = run(x)
        _ = float(jnp.sum(out))
        t0 = time.time()
        for _ in range(3):
            out = run(out)
        _ = float(jnp.sum(out))
        return (time.time() - t0) / (3 * N)

    t1, t2 = run_k(K1), run_k(K2)
    per = (t2 - t1) / (K2 - K1) * 1e6
    print(f"{label:42s}: {per:8.1f} us/GN", flush=True)
    return per


def main():
    print(f"# backend={jax.default_backend()} bf16, marginal us per "
          f"GN+AdaGN+SiLU", flush=True)
    B = 16
    total_pallas = total_xla = 0.0
    # (H, W, C, groups, count_in_model) — counts: resblock norms + head
    shapes = [
        (64, 64, 64, 32, 13),   # L0: 6 blocks x2 + head
        (32, 32, 128, 32, 15),  # L1: 6 blocks x2 + 3 attn GN
        (16, 16, 192, 32, 15),
        (8, 8, 256, 32, 13),    # incl. mid + attn
    ]
    for H, W, C, G, cnt in shapes:
        x = jnp.asarray(np.random.rand(B, H, W, C), jnp.bfloat16)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        scale = jnp.asarray(np.random.randn(B, C) * 0.1, jnp.float32)
        shift = jnp.asarray(np.random.randn(B, C) * 0.1, jnp.float32)

        def pallas_fn(y, s, sh):
            return fused_group_norm(y, G, gamma=gamma, beta=beta, scale=s,
                                    shift=sh, act=True)

        def xla_fn(y, s, sh):
            out = xla_group_norm(y, G, gamma=gamma, beta=beta)
            out = out * (1.0 + s[:, None, None, :]) + sh[:, None, None, :]
            return jax.nn.silu(out)

        mb = 2 * B * H * W * C * 2 / 1e6  # read+write bf16 MB
        p = marginal(pallas_fn, x, scale, shift,
                     f"pallas {B}x{H}x{W}x{C} ({mb:.0f}MB rw)")
        q = marginal(xla_fn, x, scale, shift,
                     f"xla    {B}x{H}x{W}x{C}")
        print(f"  -> SOL {mb/820e9*1e12:6.1f} us; pallas {p:6.1f}, xla {q:6.1f}",
              flush=True)
        total_pallas += p * cnt
        total_xla += q * cnt
    print(f"# est model total: pallas {total_pallas/1e3:.2f} ms, "
          f"xla {total_xla/1e3:.2f} ms")


if __name__ == "__main__":
    main()

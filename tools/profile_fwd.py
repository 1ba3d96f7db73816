#!/usr/bin/env python
"""Decompose the flagship model's forward time by ablation (eval path, bf16
params+activations, exactly like bench.py's sampler). N dependent evals run
inside one jitted lax.scan (the axon tunnel has ~10ms per-dispatch latency,
so single-dispatch timing is meaningless).

Usage: python tools/profile_fwd.py [batch]
"""

import sys
import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from mcvd_tpu import ops
from mcvd_tpu.models import blocks


def build_and_time(label, patch_attn=False, patch_norm=False,
                   pallas=("groupnorm",), dtype=jnp.bfloat16, B=16,
                   patch_fir=False):
    from __graft_entry__ import _flagship_config
    from mcvd_tpu.models import get_model, resample

    orig_attn = blocks.AttnBlock.__call__
    orig_norm = blocks.ActNorm.__call__
    orig_up, orig_down = resample.upsample_2d, resample.downsample_2d
    try:
        if patch_attn:
            blocks.AttnBlock.__call__ = lambda self, x: x
        if patch_norm:
            blocks.ActNorm.__call__ = (
                lambda self, x, emb=None, cond=None: self.act(x))
        if patch_fir:
            resample.upsample_2d = (
                lambda x, k=None, factor=2, gain=1: resample.naive_upsample_2d(
                    x, factor))
            resample.downsample_2d = (
                lambda x, k=None, factor=2, gain=1:
                resample.naive_downsample_2d(x, factor))
            blocks.resample.upsample_2d = resample.upsample_2d
            blocks.resample.downsample_2d = resample.downsample_2d
        on_tpu = jax.default_backend() != "cpu"
        ops.set_use_pallas(False)
        if pallas and on_tpu:
            ops.set_use_pallas(True, kinds=tuple(pallas))

        config = _flagship_config()
        model = get_model(config)
        sz = config.data.image_size
        x = jnp.zeros((B, sz, sz, 5), dtype)
        cond = jnp.zeros((B, sz, sz, 5), dtype)
        y = jnp.zeros((B,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
        if dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

        N = 50

        @jax.jit
        def run(x):
            def f(c, _):
                return model.apply(params, c, y, cond).astype(c.dtype), ()
            c, _ = jax.lax.scan(f, x, None, length=N)
            return c

        t0 = time.time()
        out = run(x)
        _ = float(jnp.sum(out))  # axon: force dependent host transfer
        compile_s = time.time() - t0

        n_outer = 3
        t0 = time.time()
        for _ in range(n_outer):
            out = run(out)
        _ = float(jnp.sum(out))
        dt = (time.time() - t0) / (n_outer * N) * 1e3
        print(f"{label:44s} {dt:7.2f} ms/eval  (compile {compile_s:.0f}s)",
              flush=True)
        return dt
    finally:
        blocks.AttnBlock.__call__ = orig_attn
        blocks.ActNorm.__call__ = orig_norm
        resample.upsample_2d = orig_up
        resample.downsample_2d = orig_down
        blocks.resample.upsample_2d = orig_up
        blocks.resample.downsample_2d = orig_down


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"# backend={jax.default_backend()} B={B} bf16 params+acts",
          flush=True)
    full = build_and_time("full bf16 (pure XLA) [bench config]", pallas=())
    noattn = build_and_time("no attention", patch_attn=True, pallas=())
    nonorm = build_and_time("no norms", patch_norm=True, pallas=())
    nofir = build_and_time("naive resample (FIR cost)", patch_fir=True,
                           pallas=())
    convs = build_and_time("no attn + no norms", patch_attn=True,
                           patch_norm=True, pallas=())
    base = build_and_time("convs only (no attn/norm/FIR)", patch_attn=True,
                          patch_norm=True, patch_fir=True, pallas=())
    print(f"# attn ~{full-noattn:.2f} ms, norms ~{full-nonorm:.2f} ms, "
          f"FIR ~{full-nofir:.2f} ms, convs+rest ~{convs:.2f} ms, "
          f"convs-only ~{base:.2f} ms")


if __name__ == "__main__":
    main()

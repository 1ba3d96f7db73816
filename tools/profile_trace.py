#!/usr/bin/env python
"""Per-op timing of the REAL bf16 forward (the bench program) from a
jax.profiler device trace: aggregates XLA op durations over one jitted
50-eval scan and prints the top ops by total time.

Usage: python tools/profile_trace.py [batch]
"""

import collections
import glob
import os
import re
import sys
import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

from mcvd_tpu import ops

TRACE_DIR = "/tmp/mcvd_trace"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from __graft_entry__ import _flagship_config
    from mcvd_tpu.models import get_model

    # match the shipped inference policy: pure XLA (BENCH_NOTES.md)
    ops.set_use_pallas(False)

    config = _flagship_config()
    model = get_model(config)
    sz = config.data.image_size
    dtype = jnp.bfloat16
    x = jnp.zeros((B, sz, sz, 5), dtype)
    cond = jnp.zeros((B, sz, sz, 5), dtype)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        params)

    N = 50

    @jax.jit
    def run(x):
        def f(c, _):
            return model.apply(params, c, y, cond).astype(c.dtype), ()
        c, _ = jax.lax.scan(f, x, None, length=N)
        return c

    out = run(x)
    _ = float(jnp.sum(out))
    t0 = time.time()
    out = run(out)
    _ = float(jnp.sum(out))
    wall = time.time() - t0
    print(f"# wall for {N} evals: {wall:.3f}s = {wall/N*1e3:.2f} ms/eval",
          flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        out = run(out)
        _ = float(jnp.sum(out))

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"# xplane files: {paths}", flush=True)
    pd = jax.profiler.ProfileData.from_file(paths[0])

    # aggregate device-plane events
    totals = collections.Counter()
    counts = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e3  # us
                # canonicalize: strip unique suffixes
                base = re.sub(r"[.\d]+$", "", name)
                totals[base] += dur
                counts[base] += 1
    total_us = sum(totals.values())
    print(f"# total device event time: {total_us/1e3:.2f} ms "
          f"({total_us/1e3/N:.3f} ms/eval incl. overlap double-count)")
    print(f"{'op':60s} {'total ms':>9s} {'count':>7s} {'us/eval':>8s}")
    for name, us in totals.most_common(40):
        print(f"{name[:60]:60s} {us/1e3:9.2f} {counts[name]:7d} {us/N:8.1f}")


if __name__ == "__main__":
    main()

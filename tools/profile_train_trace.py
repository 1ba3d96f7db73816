#!/usr/bin/env python
"""Per-op timing of the REAL train step (loss+grads+Adam+EMA, the bench_big
program) from a jax.profiler device trace: aggregates XLA op durations over
one jitted n_inner-step scan and prints the top ops by total time.

This is the train-side counterpart of tools/profile_trace.py (which profiles
the eval/bench forward). Used for VERDICT r3 next #2 (train-step MFU gap).

Usage: python tools/profile_train_trace.py [config] [batch] [compute_dtype]
       e.g. python tools/profile_train_trace.py kth64_big 8 bfloat16
"""

import collections
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mcvd_tpu import ops

TRACE_DIR = "/tmp/mcvd_train_trace"


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "kth64_big"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    compute_dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    from tools.bench_big import load_config

    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.models import get_model
    from mcvd_tpu.train import create_train_state
    from mcvd_tpu.train.state import make_optimizer
    from mcvd_tpu.train.step import _loss_for_batch

    ops.set_use_pallas(False)
    config = load_config(name)
    config.training.batch_size = B
    config.training.compute_dtype = compute_dtype
    model = get_model(config)
    sched = make_schedule(config)
    sz = config.data.image_size
    C = config.data.channels
    F = config.data.num_frames
    Fc = config.data.num_frames_cond + getattr(config.data, "num_frames_future", 0)
    T = F + Fc
    x0 = jnp.zeros((B, sz, sz, F * C))
    cond0 = jnp.zeros((B, sz, sz, Fc * C))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0),
                               jax.random.PRNGKey(0))
    tx = make_optimizer(config)
    X = jnp.asarray(np.random.RandomState(0).rand(B, T, sz, sz, C),
                    jnp.float32)

    N = 10

    def run_body(state, key):
        def one(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)

            def loss_fn(p):
                return _loss_for_batch(model, sched, config, p, X, sub, True)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            ema = jax.tree_util.tree_map(
                lambda s, p: 0.999 * s + 0.001 * p, st.ema_params, params)
            st = st.replace(params=params, opt_state=opt_state,
                            ema_params=ema, step=st.step + 1)
            return (st, k), loss

        (state, _), losses = jax.lax.scan(one, (state, key), None, length=N)
        return state, losses

    run = jax.jit(run_body, donate_argnums=(0,))

    t0 = time.time()
    state, losses = run(state, jax.random.PRNGKey(1))
    _ = float(jnp.sum(losses))
    print(f"# compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state, losses = run(state, jax.random.PRNGKey(2))
    _ = float(jnp.sum(losses))
    wall = time.time() - t0
    print(f"# wall for {N} steps: {wall:.3f}s = {wall/N*1e3:.2f} ms/step",
          flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        state, losses = run(state, jax.random.PRNGKey(3))
        _ = float(jnp.sum(losses))

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    print(f"# xplane files: {paths}", flush=True)
    pd = jax.profiler.ProfileData.from_file(paths[0])

    totals = collections.Counter()
    counts = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns / 1e3  # us
                base = re.sub(r"[.\d]+$", "", ev.name)
                totals[base] += dur
                counts[base] += 1
    total_us = sum(totals.values())
    print(f"# total device event time: {total_us/1e3:.2f} ms "
          f"({total_us/1e3/N:.3f} ms/step incl. overlap double-count)")
    print(f"{'op':60s} {'total ms':>9s} {'count':>7s} {'us/step':>8s}")
    for opname, us in totals.most_common(50):
        print(f"{opname[:60]:60s} {us/1e3:9.2f} {counts[opname]:7d} {us/N:8.1f}")


if __name__ == "__main__":
    main()

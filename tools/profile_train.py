#!/usr/bin/env python
"""Train-step time, pallas GN+attention vs pure-XLA (dot-stats GN), bf16-free
fp32 training exactly as Runner.train runs it. N steps chained inside one
jit via lax.scan (axon dispatch latency).

Usage: python tools/profile_train.py [batch]
"""

import sys
import time

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu import ops


def timed(kinds, B, compute_dtype="float32"):
    from __graft_entry__ import _flagship_config
    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.models import get_model
    from mcvd_tpu.train import create_train_state
    from mcvd_tpu.train.step import _loss_for_batch
    import optax

    ops.set_use_pallas(False)
    if kinds:
        ops.set_use_pallas(True, kinds=kinds)

    config = _flagship_config()
    config.training.batch_size = B
    config.training.compute_dtype = compute_dtype
    model = get_model(config)
    sched = make_schedule(config)
    sz = config.data.image_size
    T = config.data.num_frames + config.data.num_frames_cond
    x0 = jnp.zeros((B, sz, sz, 5))
    cond0 = jnp.zeros((B, sz, sz, 5))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0),
                               jax.random.PRNGKey(0))
    import mcvd_tpu.train.state as state_mod
    tx = state_mod.make_optimizer(config)

    X = jnp.asarray(np.random.RandomState(0).rand(B, T, sz, sz, 1), jnp.float32)
    N = 10

    @jax.jit
    def run(state, key):
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

    t0 = time.time()
    state, losses = run(state, jax.random.PRNGKey(1))
    _ = float(jnp.sum(losses))
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(3):
        state, losses = run(state, jax.random.PRNGKey(2 + i))
    _ = float(jnp.sum(losses))
    dt = (time.time() - t0) / (3 * N) * 1e3
    label = ("+".join(kinds) if kinds else "pure XLA") + " " + compute_dtype
    print(f"train step [{label:24s}] B={B}: {dt:7.2f} ms/step "
          f"(compile {compile_s:.0f}s) loss[last]={float(losses[-1]):.2f}",
          flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"# backend={jax.default_backend()}", flush=True)
    timed((), B)
    timed((), B, compute_dtype="bfloat16")
    timed(("groupnorm",), B)


if __name__ == "__main__":
    main()

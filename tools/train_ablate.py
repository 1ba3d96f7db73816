#!/usr/bin/env python
"""Train-step ablation bench (VERDICT r3 next #2): time the big-config train
step under controlled deltas to locate the train/eval MFU gap.

Variants:
  base        — the real step (loss+grads+Adam+EMA), training.compute_dtype
  nodrop      — dropout forced 0 (isolates dropout-mask RNG cost)
  rbg         — rbg PRNG keys instead of threefry (isolates PRNG bit-gen cost)
  gradonly    — loss+grads, no Adam/EMA/clip (isolates optimizer chain cost)
  noema       — full step minus EMA update
  remat       — jax.checkpoint on the score-network apply

Usage: python tools/train_ablate.py [config] [batch] [variants...]
"""

import os
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

V5E_BF16_PEAK = 197e12


def bench(name, config, B, variant, n_inner=10, reps=3):
    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.models import get_model
    from mcvd_tpu.train import create_train_state
    from mcvd_tpu.train.state import make_optimizer
    from mcvd_tpu.train.step import _loss_for_batch

    ops.set_use_pallas(False)
    config.training.batch_size = B
    config.training.compute_dtype = "bfloat16"
    # training.rng_impl now defaults to rbg; pin it per-variant so 'base'
    # still measures the threefry baseline the docstring documents
    config.training.rng_impl = "rbg" if variant == "rbg" else "threefry"
    if variant == "nodrop":
        config.model.dropout = 0.0
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
    X = jnp.asarray(np.random.RandomState(0).rand(B, T, sz, sz, C), jnp.float32)

    use_opt = variant != "gradonly"
    use_ema = variant not in ("gradonly", "noema")

    def key0(seed):
        if variant == "rbg":
            return jax.random.key(seed, impl="rbg")
        return jax.random.PRNGKey(seed)

    def run_body(state, key):
        def one(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)

            def loss_fn(p):
                return _loss_for_batch(model, sched, config, p, X, sub, True)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            if use_opt:
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
            else:
                opt_state = st.opt_state
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-9 * g, st.params, grads)
            if use_ema:
                ema = jax.tree_util.tree_map(
                    lambda s, p: 0.999 * s + 0.001 * p, st.ema_params, params)
            else:
                ema = st.ema_params
            st = st.replace(params=params, opt_state=opt_state,
                            ema_params=ema, step=st.step + 1)
            return (st, k), loss

        (state, _), losses = jax.lax.scan(one, (state, key), None,
                                          length=n_inner)
        return state, losses

    run = jax.jit(run_body, donate_argnums=(0,))

    def one_step(state, key):
        def loss_fn(p):
            return _loss_for_batch(model, sched, config, p, X, key, True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), loss

    try:
        ca = jax.jit(one_step).lower(state, key0(1)).cost_analysis()
        flops = float(ca["flops"]) if ca and ca.get("flops") else float("nan")
    except Exception:
        flops = float("nan")

    t0 = time.time()
    state, losses = run(state, key0(1))
    _ = float(jnp.sum(losses))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(reps):
        state, losses = run(state, key0(2 + i))
    _ = float(jnp.sum(losses))
    dt = (time.time() - t0) / (reps * n_inner)
    mfu = flops / dt / V5E_BF16_PEAK
    print(f"{name:16s} {variant:10s}: {dt*1e3:7.2f} ms/step  "
          f"MFU {mfu*100:5.1f}%  (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    from tools.bench_big import load_config

    name = sys.argv[1] if len(sys.argv) > 1 else "kth64_big"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    variants = sys.argv[3:] or ["base", "nodrop", "rbg", "gradonly", "noema"]
    for v in variants:
        config = load_config(name)
        try:
            bench(name, config, B, v)
        except Exception as e:
            print(f"{name:16s} {v:10s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

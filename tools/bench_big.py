#!/usr/bin/env python
"""Big-config benchmarks (VERDICT r2 next #2): frames/s/chip for sampling
evals and ms/step + MFU for train steps on the kth64_big (ngf=96),
cityscapes_big (128px, ngf=128) and ucf101 (ngf=192) shapes — the lane-fill
territory where the parked Pallas/Winograd kernels might win — plus a
per-shape kernel shoot-out (pure XLA vs pallas groupnorm vs pallas attn).

MFU accounting: FLOPs from jit(...).lower().compile().cost_analysis()
divided by measured time over the v5e bf16 peak (197 TFLOP/s; fp32 runs are
also reported against the bf16 peak so columns are comparable — the MXU has
no separate fp32 path, f32 convs decompose into bf16 passes).

Usage: python tools/bench_big.py [kth64_big cityscapes_big ucf101 ...]
       [--eval-batch N] [--train-batch N] [--reps 3] [--no-shootout]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcvd_tpu.utils import setup_jax

setup_jax()

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mcvd_tpu import ops

V5E_BF16_PEAK = 197e12
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flops(lowered) -> float:
    """FLOPs from client-side HLO analysis (no backend compile — axon
    compiles cost 20-500s); falls back to the compiled executable's
    analysis if unavailable."""
    try:
        ca = lowered.cost_analysis()
        if ca and ca.get("flops"):
            return float(ca["flops"])
    except Exception:
        pass
    return float(lowered.compile().cost_analysis()["flops"])


def load_config(name: str):
    from mcvd_tpu.config import dict2namespace

    with open(os.path.join(REPO, "configs", f"{name}.yml")) as f:
        return dict2namespace(yaml.safe_load(f))


def log(msg):
    print(msg, flush=True)


def time_eval(config, B, pallas=(), dtype=jnp.bfloat16, n_inner=30, reps=3):
    """ms per score-network eval (the sampling hot op): N dependent evals in
    one lax.scan dispatch (axon: per-dispatch latency + non-blocking
    block_until_ready make single-dispatch timing meaningless)."""
    from mcvd_tpu.models import get_model

    ops.set_use_pallas(False)
    if pallas:
        ops.set_use_pallas(True, kinds=tuple(pallas))
    model = get_model(config)
    sz = config.data.image_size
    C = config.data.channels
    F = config.data.num_frames
    Fc = config.data.num_frames_cond + getattr(config.data, "num_frames_future", 0)
    x = jnp.zeros((B, sz, sz, F * C), dtype)
    cond = jnp.zeros((B, sz, sz, Fc * C), dtype)
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)

    # params MUST be a jit argument, not a closure: closed-over arrays embed
    # as HLO constants, and at ngf=192 the serialized program then exceeds
    # the axon remote-compile tunnel's request-body limit (HTTP 413).
    def run_body(params, x):
        def f(c, _):
            return model.apply(params, c, y, cond).astype(c.dtype), ()

        c, _ = jax.lax.scan(f, x, None, length=n_inner)
        return c

    run = jax.jit(run_body)
    # FLOPs of ONE eval from a non-scanned lowering (HLO cost analysis does
    # not reliably scale while-loop bodies by trip count)
    one = jax.jit(lambda pp, xx: model.apply(pp, xx, y, cond))
    flops = _flops(one.lower(params, x))

    t0 = time.time()
    out = run(params, x)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = run(params, out)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / (reps * n_inner)
    mfu = flops / dt / V5E_BF16_PEAK
    ops.set_use_pallas(False)
    return dict(ms=dt * 1e3, mfu=mfu, flops=flops, compile_s=compile_s)


def time_train(config, B, compute_dtype="bfloat16", pallas=(), n_inner=10,
               reps=3):
    """ms per train step (loss+grads+Adam+EMA) via K-step lax.scan."""
    import optax

    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.models import get_model
    from mcvd_tpu.train import create_train_state
    from mcvd_tpu.train.state import make_optimizer
    from mcvd_tpu.train.step import _loss_for_batch

    ops.set_use_pallas(False)
    if pallas:
        ops.set_use_pallas(True, kinds=tuple(pallas))
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

        (state, _), losses = jax.lax.scan(one, (state, key), None,
                                          length=n_inner)
        return state, losses

    def one_step(state, key):
        def loss_fn(p):
            return _loss_for_batch(model, sched, config, p, X, key, True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return optax.apply_updates(state.params, updates), loss

    run = jax.jit(run_body)
    flops = _flops(jax.jit(one_step).lower(state, jax.random.PRNGKey(1)))
    t0 = time.time()
    state, losses = run(state, jax.random.PRNGKey(1))
    _ = float(jnp.sum(losses))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(reps):
        state, losses = run(state, jax.random.PRNGKey(2 + i))
    _ = float(jnp.sum(losses))
    dt = (time.time() - t0) / (reps * n_inner)
    mfu = flops / dt / V5E_BF16_PEAK
    ops.set_use_pallas(False)
    return dict(ms=dt * 1e3, mfu=mfu, flops=flops, compile_s=compile_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*",
                    default=["kth64_big", "cityscapes_big", "ucf101"])
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-shootout", action="store_true")
    ap.add_argument("--no-train", action="store_true")
    ap.add_argument("--no-eval", action="store_true")
    ap.add_argument("--train-dtypes", nargs="*", default=["bfloat16", "float32"])
    args = ap.parse_args()

    log(f"# backend={jax.default_backend()} eval B={args.eval_batch} "
        f"train B={args.train_batch}")
    results = {}
    for name in args.configs:
        config = load_config(name)
        sub = int(getattr(config.sampling, "subsample", 100) or 100)
        F = config.data.num_frames
        res = {}
        if not args.no_eval:
            e = time_eval(config, args.eval_batch, reps=args.reps)
            # frames/s/chip at the config's subsample: one block of F frames
            # costs (subsample+1) evals
            fps = args.eval_batch * F / (e["ms"] / 1e3 * (sub + 1))
            res["eval"] = {**e, "frames_per_s": fps}
            log(f"{name:20s} eval  bf16 XLA   : {e['ms']:8.2f} ms/eval  "
                f"MFU {e['mfu']*100:5.1f}%  -> {fps:6.1f} f/s @{sub}-step  "
                f"(compile {e['compile_s']:.0f}s)")
        if not args.no_shootout and not args.no_eval:
            for kinds, tag in ((("groupnorm",), "pallas GN"),
                               (("attention",), "pallas attn"),
                               (("winograd",), "winograd")):
                try:
                    e2 = time_eval(config, args.eval_batch, pallas=kinds,
                                   reps=args.reps)
                    res[f"eval_{tag}"] = e2
                    log(f"{name:20s} eval  {tag:10s}: {e2['ms']:8.2f} ms/eval  "
                        f"MFU {e2['mfu']*100:5.1f}%")
                except Exception as ex:
                    log(f"{name:20s} eval  {tag:10s}: FAILED ({ex})")
        if not args.no_train:
            for cd in args.train_dtypes:
                try:
                    t = time_train(config, args.train_batch, compute_dtype=cd,
                                   reps=args.reps)
                    res[f"train_{cd}"] = t
                    log(f"{name:20s} train {cd:10s}: {t['ms']:8.2f} ms/step "
                        f"MFU {t['mfu']*100:5.1f}%  (compile {t['compile_s']:.0f}s)")
                except Exception as ex:
                    log(f"{name:20s} train {cd:10s}: FAILED ({ex})")
        results[name] = res
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()

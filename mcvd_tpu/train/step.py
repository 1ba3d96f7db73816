"""The pjit train step: transform -> conditioning -> DSM loss -> grads ->
clip+Adam -> EMA, all fused in one jitted program over the data mesh.

Reference hot loop: ncsn_runner.py:371-418 (host-side torch ops + DataParallel
scatter/gather). Here the whole step is one XLA program: batch sharded over
the 'data' axis, params replicated, gradient all-reduce inserted by the
compiler (SURVEY.md §2.5 plan).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.conditioning import conditioning_fn
from ..data.transforms import data_transform
from ..diffusion.loss import dsm_loss
from ..diffusion.schedules import DiffusionSchedule
from ..parallel.mesh import batch_sharding, has_tensor_axis
from .state import TrainState, make_optimizer


def _as_impl_key(key, config):
    """Convert the incoming (threefry) step key to the configured PRNG impl
    INSIDE the jitted program, so all host-side plumbing (seeds, splits,
    checkpoints) stays impl-agnostic.

    training.rng_impl = "rbg" (default) uses the XLA RngBitGenerator: on TPU
    threefry bit-gen is a long VPU op chain and the per-step dropout masks +
    noise draws cost ~18% of the kth64_big train step (tools/train_ablate.py:
    22.6 -> 19.1 ms/step with rbg). Trade-off, documented: rbg streams are
    backend-dependent (CPU vs TPU draws differ) and rbg split derivation is
    statistically — not cryptographically — independent; training/eval-noise
    draws need neither property. "threefry" restores the backend-invariant
    default-impl stream.
    """
    impl = getattr(getattr(config, "training", None), "rng_impl", "rbg")
    if impl in ("rbg", "unsafe_rbg"):
        import jax.numpy as jnp

        data = key if jnp.issubdtype(key.dtype, jnp.uint32) else (
            jax.random.key_data(key))
        # threefry key data is 2x uint32; rbg wants 4x — duplicating the 64
        # seed bits preserves the full entropy
        return jax.random.wrap_key_data(
            jnp.concatenate([data, data])[:4], impl=impl)
    return key


def _loss_for_batch(model, sched: DiffusionSchedule, config, params, X, key,
                    train: bool):
    """Shared loss computation for train/eval steps. X: (B,T,H,W,C) raw [0,1].

    training.compute_dtype = "bfloat16" runs the score network (fwd+bwd) in
    bf16 — the TPU-idiomatic mixed precision: fp32 master params cast to
    bf16 inside the loss (grads flow through the cast and accumulate fp32),
    the DSM chain math (noising, target, reduction) stays fp32, GN stats are
    fp32 internally (layers.group_norm_folded). Eval loss always runs fp32.
    """
    import jax.numpy as jnp

    key = _as_impl_key(key, config)
    k_deq, k_mask, k_loss, k_drop, k_cond = jax.random.split(key, 5)
    # X may arrive in a reduced wire dtype (training.wire_dtype=float16 or
    # uint8): the host->device tunnel runs at ~65MB/s, so fewer bytes =
    # smaller transfer wall; all math runs f32 from here on. uint8 carries
    # round(x*255) (lossless for uint8-sourced video).
    if X.dtype == jnp.uint8:
        X = X.astype(jnp.float32) / 255.0
    else:
        X = X.astype(jnp.float32)
    X = data_transform(config, X, key=k_deq)
    conditional = config.data.num_frames_cond > 0
    pred, cond, cond_mask = conditioning_fn(
        config,
        X,
        key=k_mask,
        num_frames_pred=config.data.num_frames,
        prob_mask_cond=getattr(config.data, "prob_mask_cond", 0.0),
        prob_mask_future=getattr(config.data, "prob_mask_future", 0.0),
        conditional=conditional,
    )

    comp = getattr(config.training, "compute_dtype", "float32")
    bf16 = train and comp in ("bfloat16", "bf16")
    if bf16:
        cast_params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    else:
        cast_params = params

    def model_fn(x_t, labels, c, m):
        if bf16:
            x_t = x_t.astype(jnp.bfloat16)
            c = None if c is None else c.astype(jnp.bfloat16)
        out = model.apply(
            {"params": cast_params},
            x_t,
            labels,
            c,
            m,
            sched=sched,
            rng=k_cond,
            train=train,
            rngs={"dropout": k_drop} if train else {},
        )
        return out.astype(jnp.float32) if bf16 else out

    return dsm_loss(
        k_loss,
        model_fn,
        pred,
        sched,
        cond=cond,
        cond_mask=cond_mask,
        gamma=getattr(config.model, "gamma", False),
        L1=getattr(config.training, "L1", False),
        all_frames=getattr(config.model, "output_all_frames", False),
    )


def _make_step_body(model, sched, config):
    """One SGD step: loss -> grads -> clip+Adam -> EMA. Shared by the
    per-dispatch step and the chunked (lax.scan) multi-step program."""
    tx = make_optimizer(config)
    ema_rate = getattr(config.model, "ema_rate", 0.999)
    use_ema = getattr(config.model, "ema", False)

    def step(state: TrainState, X, key):
        def loss_fn(params):
            return _loss_for_batch(model, sched, config, params, X, key, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if use_ema:
            ema_params = jax.tree_util.tree_map(
                lambda s, p: ema_rate * s + (1.0 - ema_rate) * p, state.ema_params, params
            )
        else:
            ema_params = state.ema_params
        new_state = state.replace(
            params=params, opt_state=opt_state, ema_params=ema_params,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return step


def make_train_step(model, sched: DiffusionSchedule, config, mesh: Optional[Mesh] = None,
                    donate: bool = False) -> Callable:
    # donate=True halves peak state memory. The axon TPU backend rejected
    # donated buffers (InvalidArgument) through r2 but accepts them as of
    # r3 — callers gate on utils.donation_supported() (live probe).
    """Returns step(state, X, key) -> (state, metrics). X is (B,T,H,W,C) in
    [0,1], sharded over 'data' if a mesh is given."""
    step = _make_step_body(model, sched, config)

    if mesh is not None:
        # X is (B,T,H,W,C): batch over 'data'; with a non-trivial 'tensor'
        # axis also H over 'tensor' (spatial parallelism — GSPMD inserts the
        # conv halos and the norm/attention cross-shard reductions).
        repl = NamedSharding(mesh, P())
        batch_sh = batch_sharding(mesh, 5, h_axis=2)
        return jax.jit(
            step,
            in_shardings=(repl, batch_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_chunk(model, sched: DiffusionSchedule, config, K: int,
                     mesh: Optional[Mesh] = None,
                     donate: bool = False) -> Callable:
    """Returns chunk(state, Xs, key, n_active) -> (state, metrics): K train
    steps chained in ONE jitted lax.scan dispatch.

    Motivation (TPU/axon): the tunnel costs ~170ms per dispatch+sync at the
    Runner's per-step loop granularity while the flagship step computes in
    ~51ms — chaining K steps amortizes dispatch to ~1/K (tools/
    diag in BENCH_NOTES.md). The reference's hot loop is inherently
    per-step host-side torch (ncsn_runner.py:371-418); this is a pure win of
    the compiled-program design.

    Xs is (K, B, T, H, W, C). `n_active` (device scalar) marks how many
    leading slots are real work — the tail chunk of a run passes
    n_active < K and the trailing slots are exact no-ops (lax.cond), so ONE
    compiled program covers every chunk. Metrics are (K,) arrays; slots
    >= n_active hold NaN.
    """
    import jax.numpy as jnp

    step = _make_step_body(model, sched, config)

    def chunk(state: TrainState, Xs, key, n_active):
        keys = jax.random.split(key, K)

        def body(st, inp):
            i, X, k = inp

            def do(st):
                st2, m = step(st, X, k)
                return st2, (m["loss"], m["grad_norm"])

            def skip(st):
                return st, (jnp.float32(jnp.nan), jnp.float32(jnp.nan))

            return jax.lax.cond(i < n_active, do, skip, st)

        state, (losses, gns) = jax.lax.scan(
            body, state, (jnp.arange(K), Xs, keys))
        return state, {"loss": losses, "grad_norm": gns}

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        bs = batch_sharding(mesh, 5, h_axis=2)
        # (K, B, T, H, W, C): scan axis replicated, batch over 'data',
        # H over 'tensor' when present
        chunk_sh = NamedSharding(mesh, P(None, *bs.spec))
        return jax.jit(chunk, in_shardings=(repl, chunk_sh, repl, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(model, sched: DiffusionSchedule, config,
                        mesh: Optional[Mesh] = None) -> Callable:
    """Validation DSM loss on EMA params (reference: ncsn_runner.py:453-479)."""

    def eval_step(params, X, key):
        return _loss_for_batch(model, sched, config, params, X, key, train=False)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = batch_sharding(mesh, 5, h_axis=2)
        return jax.jit(eval_step, in_shardings=(repl, batch_sh, repl),
                       out_shardings=repl)
    return jax.jit(eval_step)

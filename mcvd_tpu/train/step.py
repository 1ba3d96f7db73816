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


def _loss_for_batch(model, sched: DiffusionSchedule, config, params, X, key,
                    train: bool):
    """Shared loss computation for train/eval steps. X: (B,T,H,W,C) raw [0,1]."""
    k_deq, k_mask, k_loss, k_drop, k_cond = jax.random.split(key, 5)
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

    def model_fn(x_t, labels, c, m):
        return model.apply(
            {"params": params},
            x_t,
            labels,
            c,
            m,
            sched=sched,
            rng=k_cond,
            train=train,
            rngs={"dropout": k_drop} if train else {},
        )

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


def make_train_step(model, sched: DiffusionSchedule, config, mesh: Optional[Mesh] = None,
                    donate: bool = False) -> Callable:
    # donate=True halves state memory but the current axon TPU backend
    # rejects donated buffers (InvalidArgument); keep opt-in until fixed.
    """Returns step(state, X, key) -> (state, metrics). X is (B,T,H,W,C) in
    [0,1], sharded over 'data' if a mesh is given."""
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

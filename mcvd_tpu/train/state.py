"""Train state and optimizer.

Reference: losses/__init__.py:4-23 (Adam/RMSProp/SGD + linear LR warmup) and
the checkpoint tuple [model, optimizer, epoch, step, ema]
(ncsn_runner.py:424-439). Here state is one flax.struct pytree; EMA update is
fused into the jitted train step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray   # int32 scalar
    epoch: jnp.ndarray  # int32 scalar


def make_optimizer(config) -> optax.GradientTransformation:
    """Adam(beta1, 0.999, eps)[+amsgrad] / RMSProp / SGD(momentum=0.9) with
    linear warmup to optim.lr and global-norm clipping (reference:
    losses/__init__.py, grad clip at ncsn_runner.py:399)."""
    opt = config.optim
    warmup = getattr(opt, "warmup", 0)

    def lr_schedule(step):
        # reference warmup_lr: lr * min(step/warmup, 1), step pre-increment
        if warmup and warmup > 0:
            return opt.lr * jnp.minimum(step.astype(jnp.float32) / max(warmup, 1), 1.0)
        return jnp.asarray(opt.lr, jnp.float32)

    name = getattr(opt, "optimizer", "Adam")
    wd = getattr(opt, "weight_decay", 0.0)
    if name == "Adam":
        if getattr(opt, "amsgrad", False):
            base = optax.amsgrad(
                learning_rate=lr_schedule, b1=opt.beta1, b2=0.999, eps=opt.eps
            )
        else:
            base = optax.adamw(
                learning_rate=lr_schedule, b1=opt.beta1, b2=0.999, eps=opt.eps,
                weight_decay=wd,
            ) if wd else optax.adam(
                learning_rate=lr_schedule, b1=opt.beta1, b2=0.999, eps=opt.eps
            )
    elif name == "RMSProp":
        base = optax.rmsprop(learning_rate=lr_schedule)
    elif name == "SGD":
        base = optax.sgd(learning_rate=lr_schedule, momentum=0.9)
    else:
        raise NotImplementedError(f"Optimizer {name} not understood.")

    clip = getattr(opt, "grad_clip", None)
    if clip is not None and clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), base)
    return base


def create_train_state(config, model, sample_args, rng) -> TrainState:
    """Initialize params on device (jitted init — eager init is pathologically
    slow) and build the optimizer/EMA state."""
    variables = jax.jit(model.init)(rng, *sample_args)
    params = variables["params"]
    tx = make_optimizer(config)
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        # a REAL buffer copy, not an alias: with donation an aliased tree
        # donates the same buffer twice (InvalidArgument at Execute)
        ema_params=jax.jit(
            lambda p: jax.tree_util.tree_map(jnp.copy, p))(params),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )

"""Library loaders (reference: load_model_from_ckpt.py:39-112).

`load_model(ckpt_path)` reads the config.yml sitting next to the checkpoint
and returns (model, params, config, sched). Supports both our Orbax
checkpoint directories and reference torch .pt files (converted on the fly
via compat.torch_ckpt, EMA weights applied as the reference does for eval).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import yaml

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import make_schedule, samplers
from mcvd_tpu.models import get_model as _get_model


def load_model(ckpt_path: str, device=None):
    import jax
    import jax.numpy as jnp

    cfg_path = os.path.join(os.path.dirname(ckpt_path.rstrip("/")), "config.yml")
    with open(cfg_path, "r") as f:
        config = dict2namespace(yaml.safe_load(f))
    model = _get_model(config)
    sched = make_schedule(config)

    B = 1
    C, sz = config.data.channels, config.data.image_size
    F = config.data.num_frames
    Fc = config.data.num_frames_cond + getattr(config.data, "num_frames_future", 0)
    x = jnp.zeros((B, sz, sz, F * C))
    cond = jnp.zeros((B, sz, sz, Fc * C)) if Fc else None
    y = jnp.zeros((B,), jnp.int32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)["params"]

    if ckpt_path.endswith(".pt"):
        from mcvd_tpu.compat import load_reference_checkpoint

        params = load_reference_checkpoint(
            ckpt_path, template, use_ema=getattr(config.model, "ema", False)
        )
    else:
        from mcvd_tpu.train import checkpoints
        from mcvd_tpu.train.state import create_train_state

        state = create_train_state(config, model, (x, y, cond), jax.random.PRNGKey(0))
        state = checkpoints.load_checkpoint(
            os.path.dirname(ckpt_path.rstrip("/")),
            name=os.path.basename(ckpt_path.rstrip("/")),
            target=state,
        )
        params = state.ema_params if getattr(config.model, "ema", False) else state.params

    return model, params, config, sched


def get_sampler(config, model, params, sched):
    """Returns sample(key, init, cond, cond_mask) -> final frames in [0,1]
    (reference: load_model_from_ckpt.py:79-112)."""
    import jax

    from mcvd_tpu.data.transforms import inverse_data_transform
    from mcvd_tpu.eval.video_gen import make_block_sampler

    block = make_block_sampler(config, model, sched)

    def sample(key, init, cond=None, cond_mask=None):
        out = block(params, key, init, cond, cond_mask)
        return inverse_data_transform(config, out)

    return sample


def init_samples(key, config):
    """Initial reverse-diffusion noise (reference: load_model_from_ckpt.py:99-112)."""
    import jax.numpy as jnp

    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.eval.video_gen import init_noise

    B = getattr(config.sampling, "batch_size", 1)
    sz, C = config.data.image_size, config.data.channels
    F = config.data.num_frames
    return init_noise(key, config, make_schedule(config), (B, sz, sz, F * C))

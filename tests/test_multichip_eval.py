"""Data-parallel eval: run_video_gen with the batch sharded over the
8-device virtual mesh (the eval analog of the dp train step)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcvd_tpu.parallel import data_sharding, make_mesh


def test_video_gen_sharded_batch():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_video_gen_harness import make_config, _loader

    from mcvd_tpu.diffusion import make_schedule
    from mcvd_tpu.eval.video_gen import run_video_gen
    from mcvd_tpu.models import get_model

    mesh = make_mesh(axis_names=("data",))
    assert mesh.devices.size == 8
    config = make_config()
    config.sampling.fvd = False
    config.sampling.preds_per_test = 1
    model = get_model(config)
    sched = make_schedule(config)
    B = 8
    x = jnp.zeros((B, 16, 16, 2)); cond = jnp.zeros((B, 16, 16, 2))
    y = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, y, cond)["params"]

    X = np.random.RandomState(0).rand(B, 6, 16, 16, 1).astype(np.float32)
    vm = run_video_gen(
        config, model, params, sched, iter([(X, np.zeros(B))]),
        jax.random.PRNGKey(0), preds_per_test=1,
        batch_sharding=data_sharding(mesh),
    )
    assert np.isfinite(vm["mse"]) and np.isfinite(vm["psnr"])

"""Spatial ('tensor') mesh axis: a 4x2 ('data','tensor') mesh must produce
the same train-step loss/params as the 1-device program, with activations'
H dimension sharded over 'tensor' (GSPMD conv halos + norm/attention
reductions). This exercises the second mesh axis SURVEY §2.5 reserves for
the 128px/ngf>=192 configs (reference analog: none — DataParallel only,
ncsn_runner.py:266)."""

import numpy as np
import jax
import jax.numpy as jnp

from mcvd_tpu.diffusion import make_schedule
from mcvd_tpu.models import get_model
from mcvd_tpu.parallel import make_mesh
from mcvd_tpu.parallel.mesh import batch_sharding, has_tensor_axis
from mcvd_tpu.train import create_train_state, make_train_step

from tests.test_data_and_train import make_config
import pytest


def _setup(B=8):
    config = make_config()
    model = get_model(config)
    sched = make_schedule(config)
    X = np.random.RandomState(0).rand(B, 4, 16, 16, 1).astype(np.float32)
    x0 = jnp.zeros((B, 16, 16, 2))
    cond0 = jnp.zeros((B, 16, 16, 2))
    y0 = jnp.zeros((B,), jnp.int32)
    state = create_train_state(config, model, (x0, y0, cond0),
                               jax.random.PRNGKey(0))
    return config, model, sched, X, state


@pytest.mark.heavy
def test_tensor_axis_matches_single_device():
    config, model, sched, X, state = _setup()
    key = jax.random.PRNGKey(1)

    # single device (no mesh)
    step1 = make_train_step(model, sched, config, mesh=None)
    s1, m1 = step1(state, jnp.asarray(X), key)

    # 4x2 ('data','tensor') mesh: batch over data, H over tensor
    mesh = make_mesh(axis_names=("data", "tensor"), shape=(4, 2))
    assert has_tensor_axis(mesh)
    sh = batch_sharding(mesh, 5, h_axis=2)
    assert tuple(sh.spec) == ("data", None, "tensor", None, None)
    step2 = make_train_step(model, sched, config, mesh=mesh)
    Xd = jax.device_put(jnp.asarray(X), sh)
    s2, m2 = step2(state, Xd, key)

    # same math, different partitioning: tolerance covers reduction reorder
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=2e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tensor_axis_sampling_block():
    """Sharded reverse-diffusion block on the 4x2 mesh equals the 1-device
    block (eval scaling path: batch over data, H over tensor)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcvd_tpu.eval.video_gen import make_block_sampler

    config, model, sched, X, state = _setup()
    config.sampling.subsample = 3
    block = make_block_sampler(config, model, sched)

    B, sz = 8, 16
    init = jnp.asarray(np.random.RandomState(1).randn(B, sz, sz, 2), jnp.float32)
    cond = jnp.asarray(np.random.RandomState(2).rand(B, sz, sz, 2), jnp.float32)

    out1 = np.asarray(block(state.ema_params, jax.random.PRNGKey(3), init,
                            cond, None))

    mesh = make_mesh(axis_names=("data", "tensor"), shape=(4, 2))
    sh = batch_sharding(mesh, 4, h_axis=1)
    init_d = jax.device_put(init, sh)
    cond_d = jax.device_put(cond, sh)
    with mesh:
        out2 = np.asarray(block(state.ema_params, jax.random.PRNGKey(3),
                                init_d, cond_d, None))
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-5)

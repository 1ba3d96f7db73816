"""Legacy NCSN image score networks (models/ncsnv2.py): structural tests.

No reference implementation exists to compare against — the reference's
``arch: ncsn`` dispatch returns None (runners/ncsn_runner.py:194-195 builds
an Exception without raising) and ships no NCSNv1/v2 model file — so these
tests check architecture invariants (shapes, finiteness, the raw-eps
output convention, gradient flow) over the golden-parity-tested legacy
blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import make_schedule
from mcvd_tpu.diffusion.loss import dsm_loss
from mcvd_tpu.models import get_model
from mcvd_tpu.models import ncsnv2 as m


def make_config(arch="ncsnv2", version="SMLD", image_size=16, ngf=8,
                channels=3):
    return dict2namespace({
        "data": {
            "channels": channels, "image_size": image_size,
            "num_frames": 1, "num_frames_cond": 0, "num_frames_future": 0,
            "logit_transform": False, "rescaled": False,
        },
        "model": {
            "arch": arch, "version": version, "ngf": ngf,
            "sigma_dist": "geometric", "sigma_begin": 1.0,
            "sigma_end": 0.01, "num_classes": 10, "gamma": False,
            "ema": False, "ema_rate": 0.999,
        },
    })


def _run(model, config, B=2, size=None):
    sz = size or config.data.image_size
    C = config.data.channels
    x = jnp.asarray(np.random.RandomState(0).rand(B, sz, sz, C), jnp.float32)
    y = jnp.array([1, 7], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y)
    out = jax.jit(model.apply)(params, x, y)
    assert out.shape == x.shape, out.shape
    assert bool(jnp.isfinite(out).all())
    return params, x, y, out


def test_ncsnv2_forward():
    config = make_config()
    model = get_model(config)
    assert isinstance(model, m.NCSNv2)
    _run(model, config)


def test_ncsnv2_deeper_forward():
    config = make_config()
    _run(m.NCSNv2Deeper(config), config)


def test_ncsnv2_deepest_forward():
    config = make_config(image_size=32)
    _run(m.NCSNv2Deepest(config), config)


def test_ncsnv1_cond_refinenet_forward():
    config = make_config(arch="ncsn")
    model = get_model(config)
    assert isinstance(model, m.CondRefineNetDilated)
    _run(model, config)


def test_size_dispatch():
    assert isinstance(get_model(make_config(image_size=32)), m.NCSNv2)
    assert isinstance(get_model(make_config(image_size=128)), m.NCSNv2Deeper)
    assert isinstance(get_model(make_config(image_size=256)), m.NCSNv2Deepest)


def test_output_is_raw_eps_and_sigma_free():
    """The eps convention: the net's raw output is the prediction — NO
    internal 1/sigma division (the published sigma^2-weighted score loss is
    equivalent to this framework's unweighted z-space loss only in raw
    space; an internal division would 1/sigma^2-amplify the smallest
    levels and collapse training to eps=0 — see _smld_rescale), and y is
    never consumed (noise-conditioning-free)."""
    cfg_smld = make_config(version="SMLD")
    cfg_ddpm = make_config(version="DDPM")
    model_s, model_d = m.NCSNv2(cfg_smld), m.NCSNv2(cfg_ddpm)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    y1 = jnp.array([0, 7], dtype=jnp.int32)
    y2 = jnp.array([9, 3], dtype=jnp.int32)
    params = model_s.init(jax.random.PRNGKey(0), x, y1)
    out_s = np.asarray(model_s.apply(params, x, y1))
    np.testing.assert_allclose(out_s, np.asarray(model_d.apply(params, x, y1)),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out_s, np.asarray(model_s.apply(params, x, y2)),
                               rtol=1e-6, atol=1e-7)
    # unit-scale output at init (not sigma-scale): the regression target z
    # is unit variance at every level
    assert float(np.abs(out_s).max()) < 100.0


@pytest.mark.heavy
def test_ncsnv2_dsm_grad_flow():
    """dsm_loss differentiates through the full net; every param gets a
    finite, not-all-zero gradient tree."""
    config = make_config()
    sched = make_schedule(config)
    model = get_model(config)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([0, 1]))

    def loss_fn(p):
        return dsm_loss(
            jax.random.PRNGKey(1),
            lambda xt, yt, cond, cond_mask: model.apply(p, xt, yt),
            x, sched)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert bool(jnp.isfinite(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


@pytest.mark.heavy
def test_ncsnv2_raw_eps_convention_beats_divided_output():
    """Differential regression guard for the output-convention bug.

    Predicting eps=0 gives DSM loss exactly 0.5*D (D = H*W*C = 768 here).
    On the published 50->0.01 sigma ladder, short training with the CORRECT
    raw-eps output gets below that floor (large-sigma levels make z ~=
    x_t/sigma recoverable), while the buggy internal out/sigma division
    1/sigma^2-amplifies the small-sigma levels and keeps the loss far above
    it (measured here: ~369 vs ~1079 vs floor 384 after 250 steps; the
    original at-scale run pinned at the floor for 20k steps)."""
    import optax

    config = make_config(ngf=8, image_size=16)
    config.model.sigma_begin = 50.0
    sched = make_schedule(config)
    model = get_model(config)
    data = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3),
                       jnp.float32)
    sigmas = jnp.asarray(sched.sigmas)

    def train(divide: bool, n: int = 250) -> float:
        params = model.init(jax.random.PRNGKey(0), data[:2],
                            jnp.array([0, 1]))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                def f(xt, yt, c, cm):
                    out = model.apply(p, xt, yt)
                    if divide:   # simulate the bug
                        out = out / sigmas[yt].reshape(-1, 1, 1, 1)
                    return out

                return dsm_loss(key, f, data, sched)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(n):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k)
            losses.append(float(loss))
        return float(np.mean(losses[-20:]))

    floor = 0.5 * 16 * 16 * 3
    good = train(divide=False)
    bad = train(divide=True)
    assert good < 0.98 * floor, (good, floor)
    assert bad > floor and bad > 2 * good, (good, bad, floor)

"""Score-SDE registry + sde_lib (reference: models/better/utils.py:1-187 —
dead code upstream: `import sde_lib` at :21 never resolves; here it works).

The SDE marginals are validated the non-tautological way: Euler-Maruyama
forward simulation of dx = f dt + g dw must reproduce marginal_prob's
mean/std.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcvd_tpu.diffusion import sde_lib
from mcvd_tpu.models import registry
from mcvd_tpu.config import dict2namespace


def _cfg(**model):
    return dict2namespace({"model": model})


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def test_register_model_decorator():
    @registry.register_model
    class _TestModelA:  # noqa: N801
        pass

    @registry.register_model(name="test_model_b")
    class _B:
        pass

    assert registry.get_model("_TestModelA") is _TestModelA
    assert registry.get_model("test_model_b") is _B
    with pytest.raises(ValueError, match="Already registered"):
        registry.register_model(_TestModelA)
    # cleanup: keep the global registry reusable across test orderings
    del registry._MODELS["_TestModelA"]
    del registry._MODELS["test_model_b"]


def test_builtin_models_registered():
    from mcvd_tpu.models.ncsnpp import UNetMoreDDPM

    for arch in ("unetmore", "unetmore3d", "unetmorepseudo3d"):
        assert registry.get_model(arch) is UNetMoreDDPM


def test_get_sigmas_geometric_ladder():
    cfg = _cfg(sigma_max=50.0, sigma_min=0.01, num_scales=232)
    s = registry.get_sigmas(cfg)
    assert s.shape == (232,)
    np.testing.assert_allclose(s[0], 50.0, rtol=1e-12)
    np.testing.assert_allclose(s[-1], 0.01, rtol=1e-12)
    ratios = s[1:] / s[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-9)  # geometric
    assert np.all(np.diff(s) < 0)  # large -> small


def test_get_ddpm_params_tables():
    cfg = _cfg(beta_min=0.1, beta_max=20.0, num_scales=1000)
    p = registry.get_ddpm_params(cfg)
    assert p["num_diffusion_timesteps"] == 1000
    np.testing.assert_allclose(p["betas"][0], 0.1 / 1000)
    np.testing.assert_allclose(p["betas"][-1], 20.0 / 1000)
    np.testing.assert_allclose(p["alphas"], 1.0 - p["betas"])
    np.testing.assert_allclose(p["alphas_cumprod"], np.cumprod(1.0 - p["betas"]))
    np.testing.assert_allclose(
        p["sqrt_alphas_cumprod"] ** 2 + p["sqrt_1m_alphas_cumprod"] ** 2,
        1.0,
        atol=1e-12,
    )


# ---------------------------------------------------------------------------
# sde_lib marginals vs forward simulation
# ---------------------------------------------------------------------------


def _simulate_forward(sde, x0, t_end, n_steps, rng):
    """Euler-Maruyama paths of dx = f(x,t) dt + g(t) dw from 0 to t_end."""
    dt = t_end / n_steps

    def step(x, args):
        t, key = args
        drift, diffusion = sde.sde(x, jnp.full((x.shape[0],), t))
        z = jax.random.normal(key, x.shape)
        return x + drift * dt + diffusion[:, None] * np.sqrt(dt) * z, None

    ts = jnp.arange(n_steps) * dt
    keys = jax.random.split(rng, n_steps)
    x, _ = jax.lax.scan(step, x0, (ts, keys))
    return x


@pytest.mark.parametrize(
    "sde",
    [
        sde_lib.VPSDE(beta_min=0.1, beta_max=20.0, N=1000),
        sde_lib.subVPSDE(beta_min=0.1, beta_max=20.0, N=1000),
        sde_lib.VESDE(sigma_min=0.01, sigma_max=5.0, N=1000),
    ],
    ids=["vp", "subvp", "ve"],
)
def test_marginal_matches_forward_simulation(sde):
    n_paths, n_steps, t_end = 8192, 400, 0.7
    x0 = jnp.full((n_paths, 1), 2.0)
    xt = _simulate_forward(sde, x0, t_end, n_steps, jax.random.PRNGKey(0))
    mean, std = sde.marginal_prob(x0, jnp.full((n_paths,), t_end))
    emp_mean = float(jnp.mean(xt))
    emp_std = float(jnp.std(xt))
    assert abs(emp_mean - float(mean[0, 0])) < 0.05 * max(1.0, abs(float(mean[0, 0])))
    assert abs(emp_std - float(std[0])) < 0.06 * float(std[0]) + 0.02


def test_vp_discrete_tables_and_discretize():
    sde = sde_lib.VPSDE(beta_min=0.1, beta_max=20.0, N=100)
    np.testing.assert_allclose(sde.discrete_betas[0], 0.1 / 100, rtol=1e-6)
    np.testing.assert_allclose(sde.discrete_betas[-1], 20.0 / 100, rtol=1e-6)
    x = jnp.ones((2, 3))
    t = jnp.full((2,), 0.5)  # -> timestep 49 (cast truncation of 49.5)
    f, G = sde.discretize(x, t)
    i = int(t[0] * (sde.N - 1))
    np.testing.assert_allclose(
        np.asarray(f), np.sqrt(sde.alphas[i]) * 1.0 - 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(G), np.sqrt(sde.discrete_betas[i]), rtol=1e-5)


def test_ve_discretize_and_prior():
    sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=10)
    assert np.all(np.diff(sde.discrete_sigmas) > 0)  # small -> large
    x = jnp.zeros((3, 2))
    # timestep 0: G = sigma_0 (adjacent sigma is defined as 0)
    f, G = sde.discretize(x, jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(G), sde.discrete_sigmas[0], rtol=1e-6)
    # prior std = sigma_max
    z = sde.prior_sampling(jax.random.PRNGKey(0), (20000, 1))
    assert abs(float(jnp.std(z)) - 50.0) < 1.0
    # prior_logp agrees with the normal log-density formula
    zz = jnp.asarray([[1.0, 2.0]])
    want = np.sum(
        -0.5 * np.log(2 * np.pi * 50.0**2) - np.asarray(zz[0]) ** 2 / (2 * 50.0**2)
    )
    np.testing.assert_allclose(float(sde.prior_logp(zz)[0]), want, rtol=1e-5)


# ---------------------------------------------------------------------------
# get_score_fn semantics
# ---------------------------------------------------------------------------


class _DummyModel:
    """model.apply(params, x, labels) that records labels and returns
    params['gain'] * x (so the score wrapper's scaling is observable)."""

    def __init__(self):
        self.seen_labels = None

    def apply(self, params, x, labels, **kw):
        self.seen_labels = labels
        return params["gain"] * x


def test_score_fn_vp_discrete_scaling():
    """The model label is FLIPPED to the repo ladder (index 0 = most
    noised; schedules.py), while the std lookup stays in score_sde table
    order (index 0 = data)."""
    sde = sde_lib.VPSDE(N=1000)
    model = _DummyModel()
    params = {"gain": 2.0}
    score_fn = registry.get_score_fn(sde, model, params, continuous=False)
    x = jnp.ones((2, 4))
    t = jnp.full((2,), 0.3)
    out = score_fn(x, t)
    sde_idx = (np.asarray(t) * (sde.N - 1)).astype(np.int32)
    std = sde.sqrt_1m_alphas_cumprod[sde_idx]
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(-2.0 / std[:, None], out.shape), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(model.seen_labels), (sde.N - 1) - sde_idx, rtol=1e-6
    )
    # t=0 is DATA -> the least-noised label (N-1) under the repo ladder
    score_fn(x, jnp.zeros((2,)))
    assert int(model.seen_labels[0]) == sde.N - 1


def test_score_fn_vp_continuous_scaling():
    sde = sde_lib.VPSDE(N=1000)
    model = _DummyModel()
    score_fn = registry.get_score_fn(sde, model, {"gain": 1.0}, continuous=True)
    x = jnp.ones((2, 4))
    t = jnp.full((2,), 0.3)
    out = score_fn(x, t)
    np.testing.assert_allclose(
        np.asarray(model.seen_labels), (1.0 - 0.3) * 999, rtol=1e-6
    )
    _, std = sde.marginal_prob(jnp.zeros_like(x), t)
    np.testing.assert_allclose(
        np.asarray(out),
        np.broadcast_to(-1.0 / np.asarray(std)[:, None], out.shape),
        rtol=1e-5,
    )


def test_score_fn_ve_discrete_label_flip():
    """VE discrete: t=0 (data) maps to index N-1, the LEAST-noised level
    under the repo ladder (index 0 = most noised); t=T maps to 0."""
    sde = sde_lib.VESDE(N=100)
    model = _DummyModel()
    score_fn = registry.get_score_fn(sde, model, {"gain": 1.0}, continuous=False)
    x = jnp.ones((1, 4))
    score_fn(x, jnp.zeros((1,)))
    assert int(model.seen_labels[0]) == sde.N - 1
    score_fn(x, jnp.ones((1,)))
    assert int(model.seen_labels[0]) == 0
    # VE model output IS the score (no rescale)
    out = score_fn(x, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_create_model_and_flatten_roundtrip():
    cfg = _cfg(arch="unetmore")
    # create_model resolves via model.name -> model.arch fallback
    m = registry.create_model(cfg)
    from mcvd_tpu.models.ncsnpp import UNetMoreDDPM

    assert isinstance(m, UNetMoreDDPM)
    x = jnp.arange(6.0).reshape(2, 3)
    flat = registry.to_flattened_numpy(x)
    assert flat.shape == (6,)
    back = registry.from_flattened_numpy(flat, (2, 3))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))

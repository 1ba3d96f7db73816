"""Score-SDE model registry and score-function wrappers.

Working tpu-native port of the reference's dead registry surface
(`/root/reference/models/better/utils.py:1-187`): upstream the whole module
is unimportable (`import sde_lib` at :21 — the module was never vendored), so
`register_model`, `get_sigmas`, `get_ddpm_params`, `create_model`,
`get_model_fn` and `get_score_fn` are all dead code. Here they work, backed
by `mcvd_tpu.diffusion.sde_lib`.

Differences from the torch original, by design:
  - `create_model` returns the flax Module (utils.py:88-94 wraps in
    `torch.nn.DataParallel`; data parallelism here is the runner's mesh job).
  - `get_model_fn(model, params, ...)` takes params explicitly — flax
    modules are stateless (utils.py:97-125 flips `model.train()/eval()`;
    train-mode dropout is selected via an optional rngs dict instead).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..diffusion import sde_lib

_MODELS: Dict[str, Any] = {}


def register_model(cls=None, *, name: Optional[str] = None):
    """Class decorator registering a score model (utils.py:27-43)."""

    def _register(cls):
        local_name = cls.__name__ if name is None else name
        if local_name in _MODELS:
            raise ValueError(f"Already registered model with name: {local_name}")
        _MODELS[local_name] = cls
        return cls

    if cls is None:
        return _register
    return _register(cls)


def get_model(name: str):
    """Look up a registered model class by name (utils.py:46-47)."""
    return _MODELS[name]


def get_sigmas(config) -> np.ndarray:
    """Geometric SMLD noise ladder, LARGE -> SMALL (utils.py:50-60).

    Score-SDE config fields (`model.sigma_max/sigma_min/num_scales`), unlike
    the repo's discrete ladder in diffusion/schedules.py which reads
    `sigma_begin/sigma_end/num_classes`.
    """
    return np.exp(
        np.linspace(
            np.log(config.model.sigma_max),
            np.log(config.model.sigma_min),
            config.model.num_scales,
        )
    ).astype(np.float64)


def get_ddpm_params(config) -> Dict[str, Any]:
    """Original-DDPM beta/alpha tables at 1000 steps (utils.py:63-85)."""
    num_diffusion_timesteps = 1000
    beta_start = config.model.beta_min / config.model.num_scales
    beta_end = config.model.beta_max / config.model.num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def create_model(config):
    """Instantiate the registered score model named by the config
    (utils.py:88-94; `config.model.name`, falling back to `model.arch`)."""
    model_name = getattr(config.model, "name", None) or config.model.arch
    return get_model(model_name)(config)


def get_model_fn(model, params, train: bool = False, rngs=None) -> Callable:
    """(x, labels) -> model output, with train-mode dropout iff rngs given
    (utils.py:97-125)."""

    def model_fn(x, labels):
        kwargs = {}
        if train and rngs is not None:
            kwargs["rngs"] = rngs
        return model.apply(params, x, labels, **kwargs)

    return model_fn


def get_score_fn(
    sde, model, params, train: bool = False, continuous: bool = False, rngs=None
) -> Callable:
    """Wrap a model so its output is the true time-dependent score
    (utils.py:130-180). Continuous-time t in [0, sde.T]; t=0 is data.
    """
    model_fn = get_model_fn(model, params, train=train, rngs=rngs)

    if isinstance(sde, (sde_lib.VPSDE, sde_lib.subVPSDE)):

        def score_fn(x, t):
            # Model labels follow THIS repo's ladder (schedules.py: index 0
            # = MOST noised), so SDE time is flipped before it reaches the
            # model: t=0 (data) -> the least-noised label. The reference's
            # utils.py:141-156 passes t*999 unflipped because score_sde
            # models use the opposite label convention; ours do not.
            if continuous or isinstance(sde, sde_lib.subVPSDE):
                labels = (sde.T - t) / sde.T * 999
                score = model_fn(x, labels)
                std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                # sde tables stay in score_sde order (index 0 = data), so
                # the std lookup uses the UNflipped index.
                sde_idx = (t * (sde.N - 1)).astype(jnp.int32)
                labels = (sde.N - 1) - sde_idx
                score = model_fn(x, labels)
                std = jnp.asarray(sde.sqrt_1m_alphas_cumprod)[sde_idx]
            return -score / std[(...,) + (None,) * (x.ndim - 1)]

    elif isinstance(sde, sde_lib.VESDE):

        def score_fn(x, t):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                # t=0 (data) -> index N-1, the LEAST-noised level under the
                # repo ladder (index 0 = most noised); t=T (prior) -> 0.
                labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
            return model_fn(x, labels)

    else:
        raise NotImplementedError(
            f"SDE class {sde.__class__.__name__} not yet supported."
        )

    return score_fn


def to_flattened_numpy(x) -> np.ndarray:
    """Flatten a jax array to 1-D numpy (utils.py:183-185)."""
    return np.asarray(x).reshape((-1,))


def from_flattened_numpy(x: np.ndarray, shape) -> jnp.ndarray:
    """Inverse of `to_flattened_numpy` (utils.py:187-189)."""
    return jnp.asarray(np.asarray(x).reshape(shape))


def _register_builtin_models():
    """Expose the repo's model families through the registry under their
    config `arch` names (the torch original relies on per-module decorator
    side effects; registering here keeps imports cycle-free)."""
    from .ncsnpp import UNetMoreDDPM

    for arch in ("unetmore", "unetmore3d", "unetmorepseudo3d"):
        if arch not in _MODELS:
            _MODELS[arch] = UNetMoreDDPM


_register_builtin_models()

"""Continuous-time SDE library (VP / sub-VP / VE).

The reference ships a score-SDE model registry (`models/better/utils.py`)
whose `import sde_lib` is unresolvable — the module was never vendored, so
the whole registry surface is dead code upstream. This is the working
tpu-native equivalent: the three canonical SDEs from Song et al. (Score-Based
Generative Modeling through SDEs), implemented over jax.numpy so every method
is jit/vmap-safe (static N, no data-dependent Python control flow).

Conventions (matching the published score_sde semantics the reference's
`get_score_fn` at models/better/utils.py:130-187 assumes):
  - t runs in [0, T] with T=1.0; t=0 is DATA, t=T is the prior. Note this is
    the OPPOSITE of the repo's discrete DiffusionSchedule convention (index 0
    = most noised); `mcvd_tpu.models.registry.get_score_fn` does the mapping.
  - `discrete_sigmas` for VE is stored small->large (score_sde layout).
Discrete tables are float32 numpy at construction (trace-time constants).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import numpy as np


class SDE(abc.ABC):
    """Forward SDE dx = f(x,t) dt + g(t) dw on t in [0, T]."""

    def __init__(self, N: int):
        self.N = int(N)  # discretization steps

    @property
    def T(self) -> float:
        return 1.0

    @abc.abstractmethod
    def sde(self, x, t):
        """Drift f(x,t) and diffusion g(t)."""

    @abc.abstractmethod
    def marginal_prob(self, x, t):
        """Mean and std of p_t(x(t) | x(0))."""

    @abc.abstractmethod
    def prior_sampling(self, rng, shape):
        """Sample from the prior p_T."""

    @abc.abstractmethod
    def prior_logp(self, z):
        """Log-density of the prior, per batch element."""

    def discretize(self, x, t):
        """Euler-Maruyama one-step tables: x_{i+1} = x_i + f_i + G_i z."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        f = drift * dt
        G = diffusion * jnp.sqrt(dt)
        return f, G


def _batch_logp_normal(z, log_sigma2):
    shape = z.shape
    ndim = int(np.prod(shape[1:]))
    axes = tuple(range(1, len(shape)))
    return -0.5 * (
        ndim * (np.log(2 * np.pi) + log_sigma2)
        + jnp.sum(z**2, axis=axes) / jnp.exp(log_sigma2)
    )


class VPSDE(SDE):
    """Variance-preserving SDE (continuous DDPM)."""

    def __init__(self, beta_min: float = 0.1, beta_max: float = 20.0, N: int = 1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)
        # Discrete DDPM tables (ancestral-sampling compatibility).
        self.discrete_betas = np.linspace(
            beta_min / N, beta_max / N, N, dtype=np.float64
        ).astype(np.float32)
        self.alphas = (1.0 - self.discrete_betas).astype(np.float32)
        self.alphas_cumprod = np.cumprod(self.alphas, dtype=np.float64).astype(
            np.float32
        )
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_1m_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * beta_t[(...,) + (None,) * (x.ndim - 1)] * x
        diffusion = jnp.sqrt(beta_t)
        return drift, diffusion

    def _log_mean_coeff(self, t):
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_prob(self, x, t):
        lmc = self._log_mean_coeff(t)
        mean = jnp.exp(lmc)[(...,) + (None,) * (x.ndim - 1)] * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        return _batch_logp_normal(z, jnp.float32(0.0))

    def discretize(self, x, t):
        """Exact DDPM discretization (not Euler): f = (sqrt(1-b) - 1) x."""
        timestep = (t / self.T * (self.N - 1)).astype(jnp.int32)
        beta = jnp.asarray(self.discrete_betas)[timestep]
        sqrt_alpha = jnp.sqrt(jnp.asarray(self.alphas))[timestep]
        f = sqrt_alpha[(...,) + (None,) * (x.ndim - 1)] * x - x
        G = jnp.sqrt(beta)
        return f, G


class subVPSDE(SDE):
    """Sub-VP SDE: same marginals' mean as VP, strictly smaller variance."""

    def __init__(self, beta_min: float = 0.1, beta_max: float = 20.0, N: int = 1000):
        super().__init__(N)
        self.beta_0 = float(beta_min)
        self.beta_1 = float(beta_max)

    def sde(self, x, t):
        beta_t = self.beta_0 + t * (self.beta_1 - self.beta_0)
        drift = -0.5 * beta_t[(...,) + (None,) * (x.ndim - 1)] * x
        total = 1.0 - jnp.exp(
            -2.0 * self.beta_0 * t - (self.beta_1 - self.beta_0) * t**2
        )
        diffusion = jnp.sqrt(beta_t * total)
        return drift, diffusion

    def marginal_prob(self, x, t):
        lmc = -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0
        mean = jnp.exp(lmc)[(...,) + (None,) * (x.ndim - 1)] * x
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape)

    def prior_logp(self, z):
        return _batch_logp_normal(z, jnp.float32(0.0))


class VESDE(SDE):
    """Variance-exploding SDE (continuous SMLD)."""

    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 50.0, N: int = 1000):
        super().__init__(N)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        # small -> large (score_sde layout; the repo's discrete SMLD ladder in
        # diffusion/schedules.py is the reverse).
        self.discrete_sigmas = np.exp(
            np.linspace(np.log(sigma_min), np.log(sigma_max), N)
        ).astype(np.float32)

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * jnp.sqrt(
            2.0 * (np.log(self.sigma_max) - np.log(self.sigma_min))
        )
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, rng, shape):
        return jax.random.normal(rng, shape) * self.sigma_max

    def prior_logp(self, z):
        return _batch_logp_normal(z, jnp.float32(2.0 * np.log(self.sigma_max)))

    def discretize(self, x, t):
        """SMLD ancestral discretization: G = sqrt(sigma_i^2 - sigma_{i-1}^2)."""
        timestep = (t / self.T * (self.N - 1)).astype(jnp.int32)
        sigmas = jnp.asarray(self.discrete_sigmas)
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma), sigmas[timestep - 1])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G

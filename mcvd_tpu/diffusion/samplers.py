"""Reverse-diffusion samplers as jittable `lax.scan` programs.

Each sampler takes an `eps_fn(x, labels) -> eps` closure (the score network
already bound to params/cond/cond_mask, returning predicted noise z — NOT the
score; reference: models/__init__.py:1-3) and runs the whole reverse chain
on-device. Schedule tables are trace-time numpy constants, so step-skipping
(`subsample_steps`), `frac_steps` and `t_min` are resolved at trace time into
static table slices — no data-dependent control flow under jit.

Reference semantics reproduced exactly, including two quirks needed for
checkpoint parity:
  * subsampled betas are re-derived as 1 - alpha/alpha_prev
    (reference: models/__init__.py:229-240);
  * the final `denoise` step feeds label L-1 (the SUBSAMPLED index) to the
    model while using the subsampled table's last alpha
    (reference: models/__init__.py:330-335) — with subsampling this label is
    not the original-schedule index; we replicate it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, subsample_schedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def check_n_steps_each(n_steps_each: int) -> int:
    """Langevin samplers need >=1 inner step per sigma level. The shared
    config schema carries `sampling.n_steps_each: 0` in the DDPM-family
    YAMLs (it is a dead knob there), so running an SMLD/Langevin sampler
    against such a config would otherwise fail as a ZeroDivisionError deep
    inside a reshape — fail loudly at the boundary instead."""
    if int(n_steps_each) < 1:
        raise ValueError(
            f"sampling.n_steps_each={n_steps_each}: SMLD/Langevin samplers "
            "need at least 1 inner step per noise level (DDPM-schema "
            "configs set it to 0 — set sampling.n_steps_each and "
            "sampling.step_lr for Langevin sampling)")
    return int(n_steps_each)


class _Tables(NamedTuple):
    steps: np.ndarray        # original-schedule indices fed as labels
    alphas: np.ndarray
    alphas_prev: np.ndarray
    betas: np.ndarray
    k_cum: Optional[np.ndarray]
    theta_t: Optional[np.ndarray]
    noise_injected: bool     # t_min>0 path: x gets noised to alphas[0] first


def _prepare_tables(
    sched: DiffusionSchedule,
    subsample_steps: Optional[int],
    frac_steps: Optional[float],
    t_min: float,
) -> _Tables:
    steps, alphas, alphas_prev, betas, k_cum, theta_t = subsample_schedule(
        sched, subsample_steps
    )
    if frac_steps is not None:
        # Reference indexes the table with original step ids here, which is
        # only well-formed without subsampling (models/__init__.py:250-257).
        assert subsample_steps is None or subsample_steps >= sched.T, (
            "frac_steps cannot be combined with subsample_steps"
        )
        i0 = int((1 - frac_steps) * len(steps))
        sl = slice(i0, None)
        steps, alphas, alphas_prev, betas = steps[sl], alphas[sl], alphas_prev[sl], betas[sl]
        k_cum = k_cum[sl] if k_cum is not None else None
        theta_t = theta_t[sl] if theta_t is not None else None

    noise_injected = False
    if t_min > 0:
        # Skip steps with original index < t_min * len(table)
        # (reference: models/__init__.py:269-280) then noise the input to the
        # first executed level.
        thresh = t_min * len(alphas)
        keep = steps >= thresh
        if not keep.any():
            raise ValueError(f"t_min={t_min} skips every step")
        i0 = int(np.argmax(keep))
        sl = slice(i0, None)
        steps, alphas, alphas_prev, betas = steps[sl], alphas[sl], alphas_prev[sl], betas[sl]
        k_cum = k_cum[sl] if k_cum is not None else None
        theta_t = theta_t[sl] if theta_t is not None else None
        noise_injected = True

    return _Tables(steps, alphas, alphas_prev, betas, k_cum, theta_t, noise_injected)


def _gamma_noise(key, shape, k, theta, alpha):
    """Centered/scaled Gamma noise (reference: models/__init__.py:272-279)."""
    z = jax.random.gamma(key, k, shape=shape) * theta
    return (z - k * theta) / jnp.sqrt(1.0 - alpha)


def _maybe_inject_noise(key, x, tables: _Tables, gamma: bool):
    if not tables.noise_injected:
        return x
    a0 = jnp.float32(tables.alphas[0])
    if gamma:
        z = _gamma_noise(key, x.shape, tables.k_cum[0], tables.theta_t[0], tables.alphas[0])
    else:
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return jnp.sqrt(a0) * x + jnp.sqrt(1.0 - a0) * z


def ddpm_sampler(
    key: jax.Array,
    x_init: jnp.ndarray,
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    subsample_steps: Optional[int] = None,
    final_only: bool = True,
    denoise: bool = True,
    clip_before: bool = True,
    just_beta: bool = False,
    frac_steps: Optional[float] = None,
    t_min: float = -1.0,
    gamma: bool = False,
    same_noise: bool = False,
    noise_val: Optional[jnp.ndarray] = None,
    **_: object,
) -> jnp.ndarray:
    """DDPM ancestral sampler (reference: models/__init__.py:206-340).

    Per step i (label = original index steps[i]):
        x0 = (x - sqrt(1-a)*eps) / sqrt(a)            [optionally clipped]
        mu = sqrt(a_prev)*b/(1-a) * x0 + sqrt(1-b)*(1-a_prev)/(1-a) * x
        x  = mu + sqrt((1-a_prev)/(1-a)*b) * z        [or sqrt(b) if just_beta]
    Noise is skipped on the last step; an optional extra `denoise` step
    subtracts sqrt(1-a_L)*eps.
    Returns final x if final_only else the whole trajectory (L[+1], B, ...).
    """
    tables = _prepare_tables(sched, subsample_steps, frac_steps, t_min)
    L = len(tables.steps)
    key, inj_key = jax.random.split(key)
    x = _maybe_inject_noise(inj_key, x_init, tables, gamma)

    if same_noise and noise_val is None:
        noise_val = x_init

    steps_d = jnp.asarray(tables.steps, dtype=jnp.int32)
    alphas_d = jnp.asarray(tables.alphas)
    alphas_prev_d = jnp.asarray(tables.alphas_prev)
    betas_d = jnp.asarray(tables.betas)
    k_cum_d = jnp.asarray(tables.k_cum) if gamma else jnp.zeros((L,), jnp.float32)
    theta_d = jnp.asarray(tables.theta_t) if gamma else jnp.ones((L,), jnp.float32)
    is_last = jnp.arange(L) == (L - 1)
    step_keys = jax.random.split(key, L)

    B = x.shape[0]

    def body(x, sc):
        step, a, a_prev, b, k_c, th, last, k_noise = sc
        labels = jnp.full((B,), step, dtype=jnp.int32)
        eps = eps_fn(x, labels)
        x0 = (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        if clip_before:
            x0 = jnp.clip(x0, -1.0, 1.0)
        x = (jnp.sqrt(a_prev) * b / (1.0 - a)) * x0 + (
            jnp.sqrt(1.0 - b) * (1.0 - a_prev) / (1.0 - a)
        ) * x
        if same_noise:
            noise = noise_val
        elif gamma:
            noise = _gamma_noise(k_noise, x.shape, k_c, th, a)
        else:
            noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        std = jnp.sqrt(b) if just_beta else jnp.sqrt((1.0 - a_prev) / (1.0 - a) * b)
        x = jnp.where(last, x, x + std * noise)
        return x, (x if not final_only else 0.0)

    xs = (steps_d, alphas_d, alphas_prev_d, betas_d, k_cum_d, theta_d, is_last, step_keys)
    x, traj = jax.lax.scan(body, x, xs)

    if denoise:
        # Quirk kept for parity: label is L-1 in the subsampled index space
        # (reference: models/__init__.py:332).
        labels = jnp.full((B,), L - 1, dtype=jnp.int32)
        x = x - jnp.sqrt(1.0 - alphas_d[-1]) * eps_fn(x, labels)

    if final_only:
        return x[None]
    if denoise:
        return jnp.concatenate([traj, x[None]], axis=0)
    return traj


def ddim_sampler(
    key: jax.Array,
    x_init: jnp.ndarray,
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    subsample_steps: Optional[int] = None,
    final_only: bool = True,
    denoise: bool = True,
    clip_before: bool = True,
    frac_steps: Optional[float] = None,
    t_min: float = -1.0,
    gamma: bool = False,
    **_: object,
) -> jnp.ndarray:
    """DDIM (eta=0) sampler (reference: models/__init__.py:102-203)."""
    tables = _prepare_tables(sched, subsample_steps, frac_steps, t_min)
    L = len(tables.steps)
    key, inj_key = jax.random.split(key)
    x = _maybe_inject_noise(inj_key, x_init, tables, gamma)

    steps_d = jnp.asarray(tables.steps, dtype=jnp.int32)
    alphas_d = jnp.asarray(tables.alphas)
    alphas_prev_d = jnp.asarray(tables.alphas_prev)
    B = x.shape[0]

    def body(x, sc):
        step, a, a_prev = sc
        labels = jnp.full((B,), step, dtype=jnp.int32)
        eps = eps_fn(x, labels)
        x0 = (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        if clip_before:
            x0 = jnp.clip(x0, -1.0, 1.0)
        x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return x, (x if not final_only else 0.0)

    x, traj = jax.lax.scan(body, x, (steps_d, alphas_d, alphas_prev_d))

    if denoise:
        labels = jnp.full((B,), L - 1, dtype=jnp.int32)
        x = x - jnp.sqrt(1.0 - alphas_d[-1]) * eps_fn(x, labels)

    if final_only:
        return x[None]
    if denoise:
        return jnp.concatenate([traj, x[None]], axis=0)
    return traj


def _pndm_transfer(x, at, at_next, et, clip_before: bool):
    """PNDM transfer rule (reference: models/pndm.py:19-33)."""
    x_delta = (at_next - at) * (
        (1.0 / (jnp.sqrt(at) * (jnp.sqrt(at) + jnp.sqrt(at_next)))) * x
        - 1.0
        / (
            jnp.sqrt(at)
            * (jnp.sqrt((1 - at_next) * at) + jnp.sqrt((1 - at) * at_next))
        )
        * et
    )
    x_next = x + x_delta
    if clip_before:
        x_next = jnp.clip(x_next, -1.0, 1.0)
    return x_next


def fpndm_sampler(
    key: jax.Array,
    x_init: jnp.ndarray,
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    subsample_steps: int,
    final_only: bool = True,
    clip_before: bool = True,
    denoise: bool = True,  # unused; kept for a uniform call surface
    **_: object,
) -> jnp.ndarray:
    """F-PNDM 4th-order sampler (reference: models/__init__.py:38-99 +
    models/pndm.py). Runge-Kutta warm-up for the first 3 steps, then
    Adams-Bashforth (55 e1 - 59 e2 + 37 e3 - 9 e4)/24.

    `alphas_cump` lookups use the time-ascending table (alphas[::-1]) indexed
    at t+1, with t_next = previous step id and -1 mapping to alpha=~1
    (reference: models/__init__.py:58-76).
    """
    del key  # deterministic sampler
    assert sched.alphas is not None
    T = sched.T
    alphas_old = np.ascontiguousarray(sched.alphas[::-1])  # time-ascending
    skip = T // subsample_steps
    steps = list(range(0, T, skip))
    steps_next = [-1] + steps[:-1]
    # alphas_cump[t+1]; t=-1 -> alphas_old[0] (=cumprod at time 1, ~1 noise-free end)
    at_of = lambda t: jnp.float32(alphas_old[t + 1])

    B = x_init.shape[0]
    x = x_init
    traj = []

    def model(x, t):
        labels = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))
        return eps_fn(x, labels)

    # Runge-Kutta warm-up: exactly the first 3 iterations (ets grows by one
    # per iteration, and the AB branch takes over once len(ets) > 2 —
    # reference: models/pndm.py:41-52). Only these are Python-unrolled;
    # the remaining L-3 steps run as one lax.scan with a fixed 3-slot
    # epsilon-history carry, so the traced program has 12 + 1 model calls
    # instead of ~4+L (compile-time bomb at subsample=100 on a backend with
    # 20-500s compile variance).
    ets: list = []
    n_warmup = min(3, len(steps))
    for i in range(n_warmup):
        t, t_next = steps[i], steps_next[i]
        # runge_kutta (reference: models/pndm.py:3-17); t_mid uses integer
        # label arithmetic as in the reference ((t+t_next)/2 of int tensors
        # stays float there; labels are cast long -> trunc).
        t_mid = int((t + t_next) / 2)
        e_1 = model(x, t)
        ets.append(e_1)
        x_2 = _pndm_transfer(x, at_of(t), at_of(t_mid), e_1, clip_before)
        e_2 = model(x_2, t_mid)
        x_3 = _pndm_transfer(x, at_of(t), at_of(t_mid), e_2, clip_before)
        e_3 = model(x_3, t_mid)
        x_4 = _pndm_transfer(x, at_of(t), at_of(t_next), e_3, clip_before)
        e_4 = model(x_4, t_next)
        noise = (1.0 / 6) * (e_1 + 2 * e_2 + 2 * e_3 + e_4)
        x = _pndm_transfer(x, at_of(t), at_of(t_next), noise, clip_before)
        if not final_only:
            traj.append(x)

    if len(steps) > n_warmup:
        rest = slice(n_warmup, None)
        ts = np.asarray(steps[rest], dtype=np.int32)
        at_t = alphas_old[ts + 1]
        at_next = alphas_old[np.asarray(steps_next[rest], dtype=np.int32) + 1]

        def body(carry, sc):
            x, hist = carry  # hist: (3, B, ...) last three epsilons, oldest first
            t, a_t, a_next = sc
            e = model(x, t)
            # Adams-Bashforth 4th order (reference: models/pndm.py:47)
            noise = (1.0 / 24) * (
                55.0 * e - 59.0 * hist[2] + 37.0 * hist[1] - 9.0 * hist[0]
            )
            x = _pndm_transfer(x, a_t, a_next, noise, clip_before)
            hist = jnp.concatenate([hist[1:], e[None]], axis=0)
            return (x, hist), (x if not final_only else 0.0)

        hist0 = jnp.stack(ets)  # exactly 3 warm-up epsilons, oldest first
        xs = (jnp.asarray(ts), jnp.asarray(at_t), jnp.asarray(at_next))
        (x, _), scan_traj = jax.lax.scan(body, (x, hist0), xs)
        if not final_only:
            traj = jnp.concatenate([jnp.stack(traj), scan_traj], axis=0)
    elif not final_only:
        traj = jnp.stack(traj)

    if final_only:
        return x[None]
    return traj


def anneal_langevin_dynamics(
    key: jax.Array,
    x_init: jnp.ndarray,
    eps_fn: EpsFn,
    sched: DiffusionSchedule,
    *,
    n_steps_each: int = 200,
    step_lr: float = 0.000008,
    final_only: bool = True,
    denoise: bool = True,
    harm_mean: bool = False,
    frac_steps: Optional[float] = None,
    same_noise: bool = False,
    noise_val: Optional[jnp.ndarray] = None,
    **_: object,
) -> jnp.ndarray:
    """SMLD annealed Langevin dynamics (reference: models/__init__.py:343-410).

    Model output is z with score = -z/sigma, hence the -step/sigma * z update.
    """
    n_steps_each = check_n_steps_each(n_steps_each)
    assert sched.sigmas is not None
    sigmas = sched.sigmas
    if frac_steps is not None:
        sigmas = sigmas[int((1 - frac_steps) * len(sigmas)):]
    L = len(sigmas)
    sigma_L = float(sigmas[-1])
    hm = float(len(sigmas) / np.sum(1.0 / sigmas)) if harm_mean else 1.0

    if same_noise and noise_val is None:
        noise_val = x_init

    sigmas_d = jnp.asarray(sigmas)
    B = x_init.shape[0]
    keys = jax.random.split(key, L * n_steps_each).reshape(L, n_steps_each, -1)

    def level_body(x, sc):
        c, sigma, level_keys = sc
        labels = jnp.full((B,), c, dtype=jnp.int32)
        step_size = step_lr * (sigma / sigma_L) ** 2

        def inner(x, k_noise):
            grad = eps_fn(x, labels)
            if harm_mean:
                grad = grad * hm / sigma
            noise = (
                noise_val
                if same_noise
                else jax.random.normal(k_noise, x.shape, dtype=x.dtype)
            )
            x = x - step_size / sigma * grad + jnp.sqrt(step_size * 2.0) * noise
            return x, (x if not final_only else 0.0)

        x, inner_traj = jax.lax.scan(inner, x, level_keys)
        return x, inner_traj

    cs = jnp.arange(L, dtype=jnp.int32)
    x, traj = jax.lax.scan(level_body, x_init, (cs, sigmas_d, keys))

    if denoise:
        labels = jnp.full((B,), L - 1, dtype=jnp.int32)
        x = x - sigmas_d[-1] * eps_fn(x, labels)

    if final_only:
        return x[None]
    traj = traj.reshape(L * n_steps_each, *x.shape)
    if denoise:
        traj = jnp.concatenate([traj, x[None]], axis=0)
    return traj


def anneal_langevin_dynamics_consistent(
    key: jax.Array,
    x_init: jnp.ndarray,
    eps_fn_sigma: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    *,
    n_steps_each: int = 200,
    step_lr: float = 0.000008,
    final_only: bool = True,
    denoise: bool = True,
    eps_fn_label: Optional[EpsFn] = None,
    **_: object,
) -> jnp.ndarray:
    """Consistent annealed sampling (reference: models/__init__.py:486-579):
    geomspace sigma ladder with SNR-matched noise scale
    beta = sqrt(1 - (gamma*(1-eta))^2).

    `eps_fn_sigma(x, sigmas)` receives raw per-example sigma values
    (reference passes y_is_label=False); `eps_fn_label` is used for the final
    denoise step (labels), defaulting to eps_fn_sigma with sigma values.
    """
    n_steps_each = check_n_steps_each(n_steps_each)
    assert sched.sigmas is not None
    sigmas = sched.sigmas
    L = len(sigmas)
    sigma_begin, sigma_end = float(sigmas[0]), float(sigmas[-1])
    consistent = np.geomspace(sigma_begin, sigma_end, (L - 1) * n_steps_each + 1).astype(
        np.float32
    )
    smallest_invgamma = consistent[-1] / consistent[-2]
    lower = sigma_end**2 * (1 - smallest_invgamma)
    higher = sigma_end**2 * (1 + smallest_invgamma)
    assert lower < step_lr < higher, f"Could not satisfy {lower} < {step_lr} < {higher}"
    eta = step_lr / (sigma_end**2)

    cl = len(consistent)
    # next sigma per step; last entry unused (replicated)
    sig = consistent
    sig_next = np.concatenate([consistent[1:], consistent[-1:]])
    gamma_tab = sig / sig_next
    beta_tab = np.sqrt(np.maximum(0.0, 1.0 - (gamma_tab * (1.0 - eta)) ** 2))
    is_last = np.arange(cl) == cl - 1

    B = x_init.shape[0]
    keys = jax.random.split(key, cl)

    def body(x, sc):
        c_sigma, n_sigma, beta, last, k_noise = sc
        used = jnp.full((B,), c_sigma, dtype=x_init.dtype)
        grad = eps_fn_sigma(x, used)
        x = x - eta * c_sigma * grad
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        x = jnp.where(last, x, x + beta * n_sigma * noise)
        return x, (x if not final_only else 0.0)

    xs = (
        jnp.asarray(sig),
        jnp.asarray(sig_next),
        jnp.asarray(beta_tab),
        jnp.asarray(is_last),
        keys,
    )
    x, traj = jax.lax.scan(body, x_init, xs)

    if denoise:
        if eps_fn_label is not None:
            labels = jnp.full((B,), L - 1, dtype=jnp.int32)
            x = x - sigmas[-1] * eps_fn_label(x, labels)
        else:
            used = jnp.full((B,), sigma_end, dtype=x_init.dtype)
            x = x - sigmas[-1] * eps_fn_sigma(x, used)

    if final_only:
        return x[None]
    if denoise:
        return jnp.concatenate([traj, x[None]], axis=0)
    return traj


SAMPLERS = {
    "DDPM": ddpm_sampler,
    "DDIM": ddim_sampler,
    "FPNDM": fpndm_sampler,
    "SMLD": anneal_langevin_dynamics,
}


def get_sampler(version: str):
    """Sampler dispatch by model.version (reference: ncsn_runner.py:2702-2714)."""
    return SAMPLERS[version.upper()]

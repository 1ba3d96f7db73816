"""Schedule tables vs an independent torch oracle of the reference formulas
(reference: models/__init__.py:16-35, ncsnpp_more.py:736-749)."""

import argparse

import numpy as np
import pytest
import torch

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.diffusion import make_schedule, subsample_schedule
from mcvd_tpu.diffusion.schedules import get_sigmas


def cfg(sigma_dist="linear", version="DDPM", T=1000, begin=0.02, end=0.0001, gamma=False):
    return dict2namespace(
        {
            "model": {
                "version": version,
                "sigma_dist": sigma_dist,
                "sigma_begin": begin,
                "sigma_end": end,
                "num_classes": T,
                "gamma": gamma,
            }
        }
    )


def torch_linear_tables(begin, end, T):
    betas = torch.linspace(begin, end, T)
    alphas = torch.cumprod(1 - betas.flip(0), 0).flip(0)
    alphas_prev = torch.cat([alphas[1:], torch.tensor([1.0])])
    return betas, alphas, alphas_prev


def test_linear_schedule_matches_torch():
    c = cfg()
    sched = make_schedule(c)
    betas_t, alphas_t, alphas_prev_t = torch_linear_tables(0.02, 0.0001, 1000)
    np.testing.assert_allclose(sched.betas, betas_t.numpy(), rtol=1e-6)
    np.testing.assert_allclose(sched.alphas, alphas_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(sched.alphas_prev, alphas_prev_t.numpy(), rtol=1e-5)
    # Index 0 must be the most-noised level
    assert sched.alphas[0] < sched.alphas[-1]


def test_cosine_schedule_matches_torch():
    c = cfg(sigma_dist="cosine")
    sched = make_schedule(c)
    T = 1000
    t = torch.linspace(T, 0, T + 1) / T
    s = 0.008
    f = torch.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    alphas_t = f[:-1] / f[-1]
    np.testing.assert_allclose(sched.alphas, alphas_t.numpy(), rtol=1e-5)
    alphas_prev_t = torch.cat([alphas_t[1:], torch.tensor([1.0])])
    np.testing.assert_allclose(
        sched.betas, (1 - alphas_t / alphas_prev_t).numpy(), rtol=2e-4, atol=1e-7
    )


def test_geometric_sigmas():
    c = cfg(sigma_dist="geometric", version="SMLD", begin=50.0, end=0.01)
    sig = get_sigmas(c)
    sig_t = torch.logspace(np.log10(50.0), np.log10(0.01), 1000)
    np.testing.assert_allclose(sig, sig_t.numpy(), rtol=1e-4)


def test_subsample_rederivation():
    c = cfg()
    sched = make_schedule(c)
    steps, alphas, alphas_prev, betas, _, _ = subsample_schedule(sched, 100)
    # torch oracle (reference: models/__init__.py:229-240)
    _, alphas_t, _ = torch_linear_tables(0.02, 0.0001, 1000)
    steps_t = torch.arange(0, 1000, 10)
    a_t = alphas_t.index_select(0, steps_t)
    ap_t = torch.cat([a_t[1:], torch.tensor([1.0])])
    b_t = 1.0 - a_t / ap_t
    assert len(steps) == 100 and steps[0] == 0 and steps[-1] == 990
    np.testing.assert_allclose(alphas, a_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(alphas_prev, ap_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(betas, b_t.numpy(), rtol=1e-4, atol=1e-8)


def test_gamma_buffers():
    c = cfg(gamma=True)
    sched = make_schedule(c)
    betas_t, alphas_t, _ = torch_linear_tables(0.02, 0.0001, 1000)
    theta_0 = 0.001
    k = betas_t / (alphas_t * theta_0**2)
    k_cum = torch.cumsum(k.flip(0), 0).flip(0)
    theta_t = torch.sqrt(alphas_t) * theta_0
    np.testing.assert_allclose(sched.k_cum, k_cum.numpy(), rtol=1e-4)
    np.testing.assert_allclose(sched.theta_t, theta_t.numpy(), rtol=1e-5)

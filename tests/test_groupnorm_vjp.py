"""Custom-VJP fused GroupNorm: gradients must match jax.grad through the lax
reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcvd_tpu.models.layers import group_norm, num_groups_for
from mcvd_tpu.ops.lab.groupnorm import fused_group_norm


def ref_fn(x, gamma, beta, scale, shift, G, N, act):
    out = group_norm(x, G, eps=1e-5, gamma=gamma, beta=beta, frames_last=N)
    if scale is not None:
        out = out * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    if act:
        out = jax.nn.silu(out)
    return out


@pytest.mark.parametrize("case", ["adagn_silu", "affine_only", "adagn_3d"])
def test_fused_gn_gradients_match_reference(case):
    rng = np.random.RandomState(0)
    if case == "adagn_3d":
        C, N = 8, 2
    else:
        C, N = 16, 1
    CN = C * N
    B, H, W = 2, 6, 6
    G = num_groups_for(C)
    x = jnp.asarray(rng.randn(B, H, W, CN).astype(np.float32))

    if case == "affine_only":
        gamma = jnp.asarray(rng.randn(C).astype(np.float32))
        beta = jnp.asarray(rng.randn(C).astype(np.float32))
        scale = shift = None
        act = False
        args = (x, gamma, beta)

        def f_ref(x, gamma, beta):
            return jnp.sum(ref_fn(x, gamma, beta, None, None, G, N, act) ** 2)

        def f_fused(x, gamma, beta):
            return jnp.sum(fused_group_norm(x, G, eps=1e-5, gamma=gamma,
                                            beta=beta, frames_last=N,
                                            act=act) ** 2)
    else:
        act = True
        scale = jnp.asarray(rng.randn(B, CN).astype(np.float32) * 0.1)
        shift = jnp.asarray(rng.randn(B, CN).astype(np.float32) * 0.1)
        args = (x, scale, shift)

        def f_ref(x, scale, shift):
            return jnp.sum(ref_fn(x, None, None, scale, shift, G, N, act) ** 2)

        def f_fused(x, scale, shift):
            return jnp.sum(fused_group_norm(x, G, eps=1e-5, scale=scale,
                                            shift=shift, frames_last=N,
                                            act=act) ** 2)

    # values
    np.testing.assert_allclose(float(f_fused(*args)), float(f_ref(*args)),
                               rtol=2e-4)
    # gradients
    g_ref = jax.grad(f_ref, argnums=tuple(range(len(args))))(*args)
    g_fused = jax.grad(f_fused, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

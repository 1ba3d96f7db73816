"""Pallas kernel equivalence vs lax references (interpret mode on CPU) —
the analog of the reference's CUDA-vs-CPU dual implementations
(models/better/op/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcvd_tpu.models.layers import group_norm, num_groups_for
from mcvd_tpu.models.resample import setup_kernel, upfirdn2d
from mcvd_tpu.ops.lab.attention import attention_reference, fused_attention
from mcvd_tpu.ops.fused_act import fused_leaky_relu, fused_leaky_relu_reference
from mcvd_tpu.ops.lab.groupnorm import fused_group_norm
from mcvd_tpu.ops.upfirdn import upfirdn2d_up2, upsample_2d_fast


def test_fused_group_norm_matches_reference():
    rng = np.random.RandomState(0)
    for C, N in [(32, 1), (24, 1), (16, 2)]:
        B, H, W = 2, 8, 8
        CN = C * N
        x = jnp.asarray(rng.randn(B, H, W, CN).astype(np.float32))
        g = num_groups_for(C)
        gamma = jnp.asarray(rng.randn(C).astype(np.float32))
        beta = jnp.asarray(rng.randn(C).astype(np.float32))
        ref = group_norm(x, g, eps=1e-5, gamma=gamma, beta=beta, frames_last=N)
        got = fused_group_norm(x, g, eps=1e-5, gamma=gamma, beta=beta,
                               frames_last=N, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_group_norm_adagn_silu():
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 8, 8, 32
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    scale = jnp.asarray(rng.randn(B, C).astype(np.float32))
    shift = jnp.asarray(rng.randn(B, C).astype(np.float32))
    g = num_groups_for(C)
    ref = group_norm(x, g, eps=1e-5)
    ref = ref * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
    ref = jax.nn.silu(ref)
    got = fused_group_norm(x, g, eps=1e-5, scale=scale, shift=shift, act=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_fused_attention_matches_reference():
    rng = np.random.RandomState(2)
    BH, T, D = 4, 64, 16
    q = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    scale = D ** -0.5
    ref = attention_reference(q, k, v, scale)
    got = fused_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.heavy
def test_fused_attention_packed_matches_reference():
    from mcvd_tpu.ops.lab.attention import _packed_reference, fused_attention_packed

    rng = np.random.RandomState(3)
    for B, T, C, h in [(2, 64, 32, 2), (1, 300, 48, 3), (2, 64, 64, 4)]:
        q = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        k = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        v = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        scale = (C // h) ** -0.5
        ref = _packed_reference(q, k, v, h, scale)
        got = fused_attention_packed(q, k, v, h, scale, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        def f_fused(q, k, v):
            return jnp.sum(fused_attention_packed(q, k, v, h, scale, True) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(_packed_reference(q, k, v, h, scale) ** 2)

        ga = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4)


def test_fused_leaky_relu_matches_reference():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))
    ref = fused_leaky_relu_reference(x, b)
    got = fused_leaky_relu(x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_polyphase_upfirdn_up2_matches_lax():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    k = jnp.asarray(setup_kernel([1.0, 3.0, 3.0, 1.0]) * 4.0)
    for pad in [(2, 1), (1, 1), (3, 2)]:
        ref = upfirdn2d(x, k, up=2, pad=pad)
        got = upfirdn2d_up2(x, k, pad=pad)
        assert got.shape == ref.shape, (got.shape, ref.shape, pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upsample_2d_fast_matches_model_path():
    from mcvd_tpu.models.resample import upsample_2d

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    ref = upsample_2d(x, [1.0, 3.0, 3.0, 1.0], factor=2)
    got = upsample_2d_fast(x, [1.0, 3.0, 3.0, 1.0], factor=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_group_norm_tiled_large_blocks():
    """Two-pass tiled path for blocks beyond the single-pass VMEM budget."""
    import mcvd_tpu.ops.lab.groupnorm as G

    rng = np.random.RandomState(7)
    B, H, W, C = 2, 16, 16, 32
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    scale = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    shift = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
    g = num_groups_for(C)
    ref = group_norm(x, g, eps=1e-5)
    ref = jax.nn.silu(ref * (1 + scale[:, None, None, :]) + shift[:, None, None, :])

    orig = G.SINGLE_PASS_MAX_BLOCK
    G.SINGLE_PASS_MAX_BLOCK = 1024  # force the tiled path
    try:
        got = fused_group_norm(x, g, eps=1e-5, scale=scale, shift=shift,
                               act=True, interpret=True)
    finally:
        G.SINGLE_PASS_MAX_BLOCK = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    # gradient flows through the tiled path too (custom VJP recomputes stats)
    G.SINGLE_PASS_MAX_BLOCK = 1024
    try:
        f = lambda x: jnp.sum(fused_group_norm(x, g, eps=1e-5, scale=scale,
                                               shift=shift, act=True,
                                               interpret=True) ** 2)
        f_ref = lambda x: jnp.sum((jax.nn.silu(group_norm(x, g, eps=1e-5)
                                   * (1 + scale[:, None, None, :])
                                   + shift[:, None, None, :])) ** 2)
        ga = jax.grad(f)(x)
        gb = jax.grad(f_ref)(x)
    finally:
        G.SINGLE_PASS_MAX_BLOCK = orig
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=2e-3, atol=2e-4)


def test_fused_attention_gradients_match_reference():
    rng = np.random.RandomState(8)
    BH, T, D = 2, 16, 8
    q = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, T, D).astype(np.float32))
    scale = D ** -0.5

    def f_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    ga = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_winograd_conv3x3_matches_lax():
    """Winograd F(2,3) (ops/winograd.py) vs lax.conv SAME/stride-1 across
    shapes and dtypes; also through the model's _Conv2dMaybeWinograd flag."""
    from mcvd_tpu import ops as ops_pkg
    from mcvd_tpu.ops.lab.winograd import conv3x3_winograd

    rng = np.random.RandomState(11)
    for B, H, W, Ci, Co in [(2, 8, 8, 5, 7), (1, 16, 12, 16, 16), (3, 4, 6, 3, 2)]:
        x32 = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
        w32 = jnp.asarray(rng.randn(3, 3, Ci, Co).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x32, w32, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = conv3x3_winograd(x32, w32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        got_bf = conv3x3_winograd(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
        assert got_bf.dtype == jnp.bfloat16
        # bf16 Winograd noise is ~2x direct-bf16 conv noise (pre-summed
        # transform terms round before the MXU accumulate)
        np.testing.assert_allclose(np.asarray(got_bf, dtype=np.float32),
                                   np.asarray(ref), rtol=0.15, atol=0.5)

    # flagged model conv path produces identical params + matching output
    from mcvd_tpu.models.blocks import Conv2dSame

    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    conv = Conv2dSame(out_ch=4, kernel=3)
    params = conv.init(jax.random.PRNGKey(0), x)
    base = conv.apply(params, x)
    try:
        ops_pkg.set_use_pallas(True, kinds=("winograd",))
        flagged = conv.apply(params, x)
    finally:
        ops_pkg.set_use_pallas(False, kinds=("winograd",))
    np.testing.assert_allclose(np.asarray(flagged), np.asarray(base),
                               rtol=1e-4, atol=1e-4)

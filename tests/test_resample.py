"""FIR resampling vs a torch oracle implementing the documented upfirdn2d
semantics (reference: models/better/op/upfirdn2d.py:163-204 native behavior)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mcvd_tpu.models.resample import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)

FIR = [1.0, 3.0, 3.0, 1.0]


def torch_upfirdn2d(x_nchw, kernel, up=1, down=1, pad=(0, 0)):
    """Independent oracle: zero-stuff to in*up, pad (can be negative), true
    convolution (flipped kernel), stride down."""
    B, C, H, W = x_nchw.shape
    kh, kw = kernel.shape
    x = x_nchw.reshape(B * C, 1, H, W)
    if up > 1:
        z = torch.zeros(B * C, 1, H, up, W, up)
        z[:, :, :, 0, :, 0] = x.reshape(B * C, 1, H, W)
        x = z.reshape(B * C, 1, H * up, W * up)
    p0, p1 = pad
    x = F.pad(x, [max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)])
    if p0 < 0 or p1 < 0:
        x = x[
            :,
            :,
            max(-p0, 0) : x.shape[2] - max(-p1, 0),
            max(-p0, 0) : x.shape[3] - max(-p1, 0),
        ]
    w = torch.flip(kernel, [0, 1]).reshape(1, 1, kh, kw)
    x = F.conv2d(x, w, stride=down)
    return x.reshape(B, C, x.shape[2], x.shape[3])


def to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())


def to_nchw(y_nhwc):
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


def _rand(B=2, C=3, H=8, W=8, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(B, C, H, W, generator=g)


def test_upfirdn_identity_pad():
    x = _rand()
    k = torch.tensor(setup_kernel(FIR))
    for up, down, pad in [(1, 1, (1, 2)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 1)), (1, 1, (-1, 2))]:
        ref = torch_upfirdn2d(x, k, up=up, down=down, pad=pad)
        got = upfirdn2d(to_nhwc(x), jnp.asarray(k.numpy()), up=up, down=down, pad=pad)
        np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_upsample_2d_matches_reference_formula():
    x = _rand()
    k = torch.tensor(setup_kernel(FIR)) * 4.0
    p = 4 - 2
    ref = torch_upfirdn2d(x, k, up=2, pad=((p + 1) // 2 + 1, p // 2))
    got = upsample_2d(to_nhwc(x), FIR, factor=2)
    assert got.shape[1] == x.shape[2] * 2
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_downsample_2d_matches_reference_formula():
    x = _rand()
    k = torch.tensor(setup_kernel(FIR))
    p = 4 - 2
    ref = torch_upfirdn2d(x, k, down=2, pad=((p + 1) // 2, p // 2))
    got = downsample_2d(to_nhwc(x), FIR, factor=2)
    assert got.shape[1] == x.shape[2] // 2
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_upsample_conv_2d_matches_torch():
    x = _rand(C=4)
    g = torch.Generator().manual_seed(1)
    w = torch.randn(5, 4, 3, 3, generator=g)  # (out, in, kh, kw)
    # torch oracle per reference up_or_down_sampling.py:73-143
    factor = 2
    k = torch.tensor(setup_kernel(FIR)) * (factor**2)
    p = (k.shape[0] - factor) - (w.shape[3] - 1)
    wt = torch.flip(w, [2, 3]).permute(1, 0, 2, 3)
    y = F.conv_transpose2d(x, wt, stride=factor, padding=0)
    ref = torch_upfirdn2d(y, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))
    w_hwio = jnp.asarray(w.permute(2, 3, 1, 0).numpy())
    got = upsample_conv_2d(to_nhwc(x), w_hwio, FIR, factor=2)
    assert got.shape[1] == x.shape[2] * 2
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_conv_downsample_2d_matches_torch():
    x = _rand(C=4)
    g = torch.Generator().manual_seed(2)
    w = torch.randn(5, 4, 3, 3, generator=g)
    factor = 2
    k = torch.tensor(setup_kernel(FIR))
    p = (k.shape[0] - factor) + (w.shape[3] - 1)
    y = torch_upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    ref = F.conv2d(y, w, stride=factor)
    w_hwio = jnp.asarray(w.permute(2, 3, 1, 0).numpy())
    got = conv_downsample_2d(to_nhwc(x), w_hwio, FIR, factor=2)
    assert got.shape[1] == x.shape[2] // 2
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_naive_resamplers():
    x = _rand()
    up = naive_upsample_2d(to_nhwc(x))
    ref_up = F.interpolate(x, scale_factor=2, mode="nearest")
    np.testing.assert_allclose(to_nchw(up), ref_up.numpy(), rtol=1e-6)
    down = naive_downsample_2d(to_nhwc(x))
    ref_down = F.avg_pool2d(x, 2)
    np.testing.assert_allclose(to_nchw(down), ref_down.numpy(), rtol=1e-5, atol=1e-6)

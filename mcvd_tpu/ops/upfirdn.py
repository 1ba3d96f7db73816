"""Optimized FIR resampling paths.

The reference's upfirdn2d CUDA kernel (models/better/op/upfirdn2d_kernel.cu)
specializes (up,down,k) into tiled kernels. On TPU the generic path is a
zero-stuffed dilated depthwise conv (models/resample.py); here we add the
polyphase decomposition for the hot up=2 case: instead of convolving a
2x-dilated input with a 4x4 kernel (3/4 of taps hit zeros), compute the 4
output phases as 2x2-tap depthwise convs and interleave — 4x fewer MACs and
no zero-stuffing.

Derivation: out[o] = sum_t kf[t] * u[o+t] with u the pad0-shifted 2x
zero-stuffed input, so only taps t with (o + t - pad0) even contribute; for
output phase p = o mod 2 those taps map to consecutive input offsets
s = (p + t - pad0)/2. Equivalence is tested against models/resample.upfirdn2d.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.resample import setup_kernel


def upfirdn2d_up2(x: jnp.ndarray, kernel: jnp.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    """upfirdn2d(x, kernel, up=2, down=1, pad) via polyphase decomposition.
    x: (B, H, W, C); matches models/resample.upfirdn2d (true convolution)."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad
    out_h = 2 * H + pad0 + pad1 - kh + 1
    out_w = 2 * W + pad0 + pad1 - kw + 1

    kf = np.asarray(jnp.flip(kernel, (0, 1)))

    def phase_out(py, px):
        ty = [t for t in range(kh) if (py + t - pad0) % 2 == 0]
        tx = [t for t in range(kw) if (px + t - pad0) % 2 == 0]
        sub = kf[np.ix_(ty, tx)]                     # (Ly, Lx)
        sy0 = (py + ty[0] - pad0) // 2
        sx0 = (px + tx[0] - pad0) // 2
        n_y = (out_h - py + 1) // 2
        n_x = (out_w - px + 1) // 2
        Ly, Lx = sub.shape
        pad_lo_y = max(0, -sy0)
        pad_lo_x = max(0, -sx0)
        pad_hi_y = max(0, (n_y - 1 + sy0 + Ly - 1) - (H - 1))
        pad_hi_x = max(0, (n_x - 1 + sx0 + Lx - 1) - (W - 1))
        w = jnp.tile(jnp.asarray(sub, x.dtype)[:, :, None, None], (1, 1, 1, C))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1),
            padding=((pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )
        y0 = sy0 + pad_lo_y
        x0 = sx0 + pad_lo_x
        return y[:, y0 : y0 + n_y, x0 : x0 + n_x]

    p00 = phase_out(0, 0)
    p01 = phase_out(0, 1)
    p10 = phase_out(1, 0)
    p11 = phase_out(1, 1)

    # interleave the four phases into the output grid
    out = jnp.zeros((B, out_h, out_w, C), x.dtype)
    out = out.at[:, 0::2, 0::2].set(p00)
    out = out.at[:, 0::2, 1::2].set(p01)
    out = out.at[:, 1::2, 0::2].set(p10)
    out = out.at[:, 1::2, 1::2].set(p11)
    return out


def upsample_2d_fast(x: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0):
    """Polyphase upsample_2d (matches models/resample.upsample_2d)."""
    if factor != 2:
        from ..models import resample

        return resample.upsample_2d(x, k, factor, gain)
    if k is None:
        k = [1.0] * factor
    kk = setup_kernel(k) * (gain * (factor**2))
    p = kk.shape[0] - factor
    return upfirdn2d_up2(x, jnp.asarray(kk), pad=((p + 1) // 2 + factor - 1, p // 2))

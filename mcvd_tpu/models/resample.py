"""FIR up/down-sampling (StyleGAN2 `upfirdn2d` semantics) on NHWC.

TPU-native equivalent of the reference CUDA kernel
(models/better/op/upfirdn2d_kernel.cu) and the StyleGAN2 wrappers
(models/better/up_or_down_sampling.py). Zero-stuffed upsampling maps to
`lhs_dilation`, the asymmetric pad maps to (possibly negative) conv padding,
and the separable FIR filter is a depthwise conv — all fused by XLA into a
single HLO conv that tiles onto the TPU. A Pallas fused variant lives in
ops/upfirdn.py for the hot resample path.

out_h = (in_h*up + pad0 + pad1 - kernel_h) // down + 1 (matches the CUDA
kernel's shape rule, upfirdn2d_kernel.cu:237-240).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def setup_kernel(k: Sequence[float]) -> np.ndarray:
    """1D->2D outer product, normalized (reference: up_or_down_sampling.py:183-190)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= k.sum()
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Upsample (zero-stuff) -> pad -> FIR convolve -> downsample on NHWC.

    Matches the torch-native op (true convolution: kernel is flipped relative
    to cross-correlation, see op/upfirdn2d.py:184). The torch op zero-stuffs
    to in*up samples (up-1 trailing zeros); lhs_dilation gives (in-1)*up+1,
    so the high-side pad absorbs the difference.
    """
    C = x.shape[-1]
    k = jnp.flip(kernel, axis=(0, 1))
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, C)).astype(x.dtype)
    pad_lo = pad[0]
    pad_hi = pad[1] + (up - 1)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(down, down),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """Reference: up_or_down_sampling.py:196-226."""
    if k is None:
        k = [1.0] * factor
    kk = setup_kernel(k) * (gain * (factor**2))
    p = kk.shape[0] - factor
    return upfirdn2d(
        x, jnp.asarray(kk), up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """Reference: up_or_down_sampling.py:228-258."""
    if k is None:
        k = [1.0] * factor
    kk = setup_kernel(k) * gain
    p = kk.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(kk), down=factor, pad=((p + 1) // 2, p // 2))


def naive_upsample_2d(x, factor: int = 2):
    """Nearest-neighbour upsample (reference: up_or_down_sampling.py:60-64)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, 1, W, 1, C)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x, factor: int = 2):
    """Mean-pool downsample (reference: up_or_down_sampling.py:67-70)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return x.mean(axis=(2, 4))


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused upsample + conv (reference: up_or_down_sampling.py:73-143):
    conv_transpose(stride=factor, VALID) then FIR.

    `w` is HWIO (kh, kw, in_ch, out_ch).
    """
    assert w.ndim == 4
    convH, convW = w.shape[0], w.shape[1]
    assert convH == convW
    if k is None:
        k = [1.0] * factor
    kk = setup_kernel(k) * (gain * (factor**2))
    p = (kk.shape[0] - factor) - (convW - 1)

    # torch does conv_transpose2d(x, w_flipped_swapped, stride, padding=0); in
    # correlate form with an HWIO kernel the flip/swap dance cancels and this
    # is exactly a zero-stuffed (lhs_dilation) full-padding correlation with w.
    x = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((convH - 1, convH - 1), (convW - 1, convW - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(
        x, jnp.asarray(kk), pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused FIR + strided conv (reference: up_or_down_sampling.py:145-181).
    `w` is HWIO."""
    convH, convW = w.shape[0], w.shape[1]
    assert convH == convW
    if k is None:
        k = [1.0] * factor
    kk = setup_kernel(k) * gain
    p = (kk.shape[0] - factor) + (convW - 1)
    x = upfirdn2d(x, jnp.asarray(kk), pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

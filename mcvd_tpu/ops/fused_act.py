"""Fused bias + LeakyReLU + scale (StyleGAN2 fused_leaky_relu).

TPU equivalent of the reference CUDA kernel
(models/better/op/fused_bias_act_kernel.cu; python wrapper op/fused_act.py).
On TPU this is a pure-VPU elementwise chain that XLA fuses into its
neighbours for free — the Pallas kernel exists as the explicit native-op
parity surface and for composition inside larger kernels. Gradients come from
JAX autodiff of the same expression (the reference hand-writes the
double-backward because torch eager cannot fuse it — not needed here).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_leaky_relu_reference(x, bias=None, negative_slope: float = 0.2,
                               scale: float = 2**0.5):
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def _kernel(x_ref, b_ref, o_ref, *, slope: float, scale: float, has_bias: bool):
    x = x_ref[:]
    if has_bias:
        x = x + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, x * slope) * scale


def fused_leaky_relu(x: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                     negative_slope: float = 0.2, scale: float = 2**0.5,
                     interpret: bool = False) -> jnp.ndarray:
    """x (..., C); bias (C,)."""
    interpret = interpret or jax.default_backend() == "cpu"
    shape = x.shape
    C = shape[-1]
    x2 = x.reshape(-1, C)
    b = bias if bias is not None else jnp.zeros((C,), x.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, slope=negative_slope, scale=scale,
                          has_bias=bias is not None),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, b)
    return out.reshape(shape)

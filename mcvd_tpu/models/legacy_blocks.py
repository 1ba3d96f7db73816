"""Legacy NCSNv1/v2 RefineNet blocks (reference: models/better/layers.py:122-500
— CRP/RCU/MSF/RefineBlock families, ConvMeanPool/MeanPoolConv/UpsampleConv,
Residual/ConditionalResidualBlock), used by the reference's legacy ``ncsn``
image architectures.

TPU-first notes: NHWC throughout; the 5x5 stride-1 pools are
``lax.reduce_window`` ops; bilinear align_corners=True resizing (torch
``F.interpolate``) is expressed as two static interpolation-matrix
contractions (separable, MXU-friendly, trivially differentiable); the
UpsampleConv channel-scramble quirk of the reference (cat x4 then
PixelShuffle, which permutes channels unless C divides 4c+2dy+dx) is
replicated exactly with a static gather.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Conv2d


def _relu(x):
    return jax.nn.relu(x)


def max_pool_5x5(x):
    """torch nn.MaxPool2d(5, stride=1, padding=2) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)])


def avg_pool_5x5(x):
    """torch nn.AvgPool2d(5, stride=1, padding=2): count_include_pad=True,
    i.e. the divisor is always 25 even at borders."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)])
    return s / 25.0


def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with torch
    align_corners=True semantics: output j samples input at
    j*(n_in-1)/(n_out-1)."""
    W = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        W[:, 0] = 1.0
        return W
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(pos).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    W[np.arange(n_out), lo] += 1.0 - frac
    W[np.arange(n_out), hi] += frac
    return W


def interpolate_bilinear_align(x, shape):
    """torch F.interpolate(x, size=shape, mode='bilinear',
    align_corners=True) on NHWC, as two static matrix contractions."""
    H, W = x.shape[1], x.shape[2]
    Ho, Wo = shape
    Mh = jnp.asarray(_align_corners_matrix(H, Ho))
    Mw = jnp.asarray(_align_corners_matrix(W, Wo))
    x = jnp.einsum("ph,bhwc->bpwc", Mh, x)
    return jnp.einsum("qw,bpwc->bpqc", Mw, x)


def _mean_pool_2x2(x):
    """mean of the four 2x2-grid subsamples (reference ConvMeanPool math)."""
    return (x[:, ::2, ::2] + x[:, 1::2, ::2]
            + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) / 4.0


class ConvMeanPool(nn.Module):
    """conv3x3 then 2x2 mean-pool (reference layers.py:343-361).
    adjust_padding prepends a (left,top) zero pad for odd spatial sizes."""

    out_ch: int
    kernel: int = 3
    bias: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = Conv2d(self.out_ch, kernel=self.kernel, bias=self.bias,
                   name="conv")(x)
        return _mean_pool_2x2(h)


class MeanPoolConv(nn.Module):
    """2x2 mean-pool then conv3x3 (reference layers.py:364-373)."""

    out_ch: int
    kernel: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.out_ch, kernel=self.kernel, bias=self.bias,
                      name="conv")(_mean_pool_2x2(x))


class UpsampleConv(nn.Module):
    """cat([x]*4, channel) -> PixelShuffle(2) -> conv3x3 (reference
    layers.py:376-386). The cat+shuffle places input channel
    (4c + 2dy + dx) mod C at output channel c, subpixel (dy, dx) — an
    intentional replication of the reference's channel scramble."""

    out_ch: int
    kernel: int = 3
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        c = np.arange(C)
        # (C, 2, 2) static gather indices: src[c, dy, dx]
        src = jnp.asarray((4 * c[:, None, None]
                           + 2 * np.arange(2)[None, :, None]
                           + np.arange(2)[None, None, :]) % C)
        sub = x[..., src]                      # (B, H, W, C, 2, 2)
        up = sub.transpose(0, 1, 4, 2, 5, 3)   # (B, H, dy, W, dx, C)
        up = up.reshape(B, 2 * H, 2 * W, C)
        return Conv2d(self.out_ch, kernel=self.kernel, bias=self.bias,
                      name="conv")(up)


class CRPBlock(nn.Module):
    """Chained residual pooling (reference layers.py:122-142)."""

    features: int
    n_stages: int
    act: Callable = _relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        pool = max_pool_5x5 if self.maxpool else avg_pool_5x5
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = pool(path)
            path = Conv2d(self.features, kernel=3, bias=False,
                          name=f"convs_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP: per-stage conditional norm, avg-pool only
    (reference layers.py:144-168)."""

    features: int
    n_stages: int
    num_classes: int
    normalizer: Any
    act: Callable = _relu

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(self.features, self.num_classes, bias=True,
                                   name=f"norms_{i}")(path, y)
            path = avg_pool_5x5(path)
            path = Conv2d(self.features, kernel=3, bias=False,
                          name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (reference layers.py:171-192)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = _relu

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = Conv2d(self.features, kernel=3, bias=False,
                           name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Conditional RCU (reference layers.py:195-220)."""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Any
    act: Callable = _relu

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(self.features, self.num_classes,
                                    bias=True,
                                    name=f"{i + 1}_{j + 1}_norm")(x, y)
                x = self.act(x)
                x = Conv2d(self.features, kernel=3, bias=False,
                           name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: per-input conv, bilinear(align_corners) resize to
    a common shape, sum (reference layers.py:223-239)."""

    features: int
    n_inputs: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape):
        assert len(xs) == self.n_inputs
        out = None
        for i, xi in enumerate(xs):
            h = Conv2d(self.features, kernel=3, bias=True,
                       name=f"convs_{i}")(xi)
            h = interpolate_bilinear_align(h, shape)
            out = h if out is None else out + h
        return out


class CondMSFBlock(nn.Module):
    """Conditional MSF (reference layers.py:242-263)."""

    features: int
    n_inputs: int
    num_classes: int
    normalizer: Any

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y, shape):
        assert len(xs) == self.n_inputs
        out = None
        for i, xi in enumerate(xs):
            h = self.normalizer(xi.shape[-1], self.num_classes, bias=True,
                                name=f"norms_{i}")(xi, y)
            h = Conv2d(self.features, kernel=3, bias=True,
                       name=f"convs_{i}")(h)
            h = interpolate_bilinear_align(h, shape)
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block: per-input RCU adapters -> MSF -> CRP -> output RCU
    (reference layers.py:266-297).

    No ``start`` field: MSF is gated purely on n_inputs > 1. The reference
    CONSTRUCTS an msf submodule whenever start=False even if a single-input
    forward never calls it; flax's compact modules only create params for
    called submodules, so such orphan torch ``msf.*`` keys would surface as
    an explicit KeyError in weight mapping rather than silently diverge."""

    features: int
    n_inputs: int
    act: Callable = _relu
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape):
        assert len(xs) == self.n_inputs
        hs = [RCUBlock(xi.shape[-1], 2, 2, self.act,
                       name=f"adapt_convs_{i}")(xi)
              for i, xi in enumerate(xs)]
        if self.n_inputs > 1:
            h = MSFBlock(self.features, self.n_inputs, name="msf")(
                hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                     name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output_convs")(h)


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (reference layers.py:300-340). Like
    RefineBlock, MSF is gated on n_inputs > 1 (no dead ``start`` field)."""

    features: int
    n_inputs: int
    num_classes: int
    normalizer: Any
    act: Callable = _relu
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], y, output_shape):
        assert len(xs) == self.n_inputs
        hs = [CondRCUBlock(xi.shape[-1], 2, 2, self.num_classes,
                           self.normalizer, self.act,
                           name=f"adapt_convs_{i}")(xi, y)
              for i, xi in enumerate(xs)]
        if self.n_inputs > 1:
            h = CondMSFBlock(self.features, self.n_inputs, self.num_classes,
                             self.normalizer, name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer,
                         self.act, name="crp")(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.num_classes, self.normalizer, self.act,
                            name="output_convs")(h, y)


def _elu(x):
    return jax.nn.elu(x)


class ResidualBlock(nn.Module):
    """ncsnv2 residual block, norm -> act -> conv twice + shortcut, optional
    'down' resample (reference layers.py:446-500)."""

    input_dim: int
    output_dim: int
    resample: Any = None            # None | 'down'
    act: Callable = _elu
    normalization: Any = None       # flax module class taking (num_features)
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        from .normalization import InstanceNorm2dPlus

        norm_cls = self.normalization or InstanceNorm2dPlus
        dil = self.dilation

        def dil_conv(out_ch, name):
            return nn.Conv(out_ch, (3, 3), padding=dil, kernel_dilation=dil,
                           name=name)

        h = norm_cls(self.input_dim, name="normalize1")(x)
        h = self.act(h)
        if self.resample == "down":
            if dil > 1:
                h = dil_conv(self.input_dim, "conv1")(h)
                h = norm_cls(self.input_dim, name="normalize2")(h)
                h = self.act(h)
                h = dil_conv(self.output_dim, "conv2")(h)
                shortcut = dil_conv(self.output_dim, "shortcut")(x)
            else:
                h = Conv2d(self.input_dim, kernel=3, name="conv1")(h)
                h = norm_cls(self.input_dim, name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            if dil > 1:
                h = dil_conv(self.output_dim, "conv1")(h)
                h = norm_cls(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = dil_conv(self.output_dim, "conv2")(h)
                shortcut = (x if self.output_dim == self.input_dim
                            else dil_conv(self.output_dim, "shortcut")(x))
            else:
                h = Conv2d(self.output_dim, kernel=3, name="conv1")(h)
                h = norm_cls(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = Conv2d(self.output_dim, kernel=3, name="conv2")(h)
                # reference quirk (layers.py:478): the plain-resample
                # shortcut is a 1x1 ncsn conv, not 3x3
                shortcut = (x if self.output_dim == self.input_dim
                            else Conv2d(self.output_dim, kernel=1,
                                        name="shortcut")(x))
        else:
            raise ValueError(f"invalid resample {self.resample}")
        return shortcut + h


class ConditionalResidualBlock(nn.Module):
    """Class-conditional ncsnv1 residual block (reference layers.py:386-443).
    Same wiring as ResidualBlock but every norm takes (x, y).

    Reference quirk: in the plain (resample=None, no-dilation) branch with
    differing dims, the reference sets ``conv_shortcut = nn.Conv2d`` and
    calls it as ``conv_shortcut(input_dim, output_dim)`` (layers.py:425,441)
    — a TypeError in torch (kernel_size missing), i.e. that combination is
    dead upstream. We use a 1x1 conv, matching the unconditional
    ResidualBlock's repaired branch."""

    input_dim: int
    output_dim: int
    num_classes: int
    resample: Any = None
    act: Callable = _elu
    normalization: Any = None       # flax class taking (features, classes)
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, y):
        from .normalization import ConditionalInstanceNorm2dPlus

        norm_cls = self.normalization or ConditionalInstanceNorm2dPlus
        dil = self.dilation

        def dil_conv(out_ch, name):
            return nn.Conv(out_ch, (3, 3), padding=dil, kernel_dilation=dil,
                           name=name)

        h = norm_cls(self.input_dim, self.num_classes, name="normalize1")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if dil > 1:
                h = dil_conv(self.input_dim, "conv1")(h)
                h = norm_cls(self.input_dim, self.num_classes,
                             name="normalize2")(h, y)
                h = self.act(h)
                h = dil_conv(self.output_dim, "conv2")(h)
                shortcut = dil_conv(self.output_dim, "shortcut")(x)
            else:
                h = Conv2d(self.input_dim, kernel=3, name="conv1")(h)
                h = norm_cls(self.input_dim, self.num_classes,
                             name="normalize2")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            if dil > 1:
                h = dil_conv(self.output_dim, "conv1")(h)
                h = norm_cls(self.output_dim, self.num_classes,
                             name="normalize2")(h, y)
                h = self.act(h)
                h = dil_conv(self.output_dim, "conv2")(h)
                shortcut = (x if self.output_dim == self.input_dim
                            else dil_conv(self.output_dim, "shortcut")(x))
            else:
                h = Conv2d(self.output_dim, kernel=3, name="conv1")(h)
                h = norm_cls(self.output_dim, self.num_classes,
                             name="normalize2")(h, y)
                h = self.act(h)
                h = Conv2d(self.output_dim, kernel=3, name="conv2")(h)
                shortcut = (x if self.output_dim == self.input_dim
                            else Conv2d(self.output_dim, kernel=1,
                                        name="shortcut")(x))
        else:
            raise ValueError(f"invalid resample {self.resample}")
        return shortcut + h

"""NCSN++ building blocks in flax/NHWC.

TPU-native rewrites of the reference layer zoo (models/better/layerspp.py,
layers3d.py): BigGAN/DDPM resblocks with AdaGN or SPADE conditioning, spatial
multi-head attention, FIR up/down resampling, 3D ("true" Conv3d) and
pseudo-3D (factorized space/time) conv families, and factorized space+time
attention.

Layout conventions:
  * 2D tensors are NHWC.
  * The 3D family keeps the reference's folded layout with channels LAST:
    (B, H, W, C*N) where the last axis is channel-major (index = c*N + n),
    mirroring the reference's (B, C*N, H, W) (ncsnpp_more.py:259-262).

Submodule attribute names intentionally mirror the torch attribute names
(Conv_0, GroupNorm_0, NIN_0, Dense_0, actnorm0, ...) so the checkpoint
converter (compat/torch_ckpt.py) can map reference checkpoints by name.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import math

import numpy as np

from . import resample
from .layers import (NIN, GroupNorm, default_init, group_norm,
                     group_norm_folded, num_groups_for)

Act = Callable[[jnp.ndarray], jnp.ndarray]


def nearest_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') semantics: index = floor(i*in/out).
    Used by SPADE to resize cond maps (reference: layerspp.py:91, 166)."""
    B, H, W, C = x.shape
    H_out, W_out = size
    if (H, W) == (H_out, W_out):
        return x
    ih = (np.arange(H_out) * H // H_out).astype(np.int32)
    iw = (np.arange(W_out) * W // W_out).astype(np.int32)
    return x[:, ih][:, :, iw]


# ---------------------------------------------------------------------------
# Conv families: 2d / 3d / pseudo3d over the folded (B,H,W,C*N) layout
# ---------------------------------------------------------------------------


class _Conv2dMaybeWinograd(nn.Conv):
    """nn.Conv that routes stride-1 SAME 3x3 convs through the Winograd
    F(2,3) path when ops.use_pallas('winograd') is on (ops/winograd.py).
    Same param structure/paths as nn.Conv, so checkpoint conversion and
    goldens are unaffected; the flag only changes the compute."""

    @nn.compact
    def __call__(self, x):
        from .. import ops as _ops

        strides = self.strides if isinstance(self.strides, tuple) else (
            (self.strides,) * 2 if self.strides else (1, 1))
        if (
            _ops.use_pallas("winograd")
            and tuple(self.kernel_size) == (3, 3)
            and tuple(strides) == (1, 1)
            and x.ndim == 4
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            kernel = self.param(
                "kernel", self.kernel_init,
                (3, 3, x.shape[-1], self.features), self.param_dtype,
            )
            y = _ops.winograd.conv3x3_winograd(x, kernel.astype(x.dtype))
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,),
                                  self.param_dtype)
                y = y + bias.astype(y.dtype)
            return y
        return super().__call__(x)


def Conv2dSame(out_ch: int, kernel: int = 3, init_scale: float = 1.0,
               stride: int = 1, bias: bool = True, name: Optional[str] = None):
    """3x3/1x1 DDPM-init conv (reference: layers.py:89-118). A plain nn.Conv
    so flax param paths mirror torch attribute paths (compat/torch_ckpt.py)."""
    return _Conv2dMaybeWinograd(
        out_ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=bias,
        kernel_init=default_init(init_scale),
        name=name,
    )


class Conv3dFolded(nn.Module):
    """True Conv3d over folded frames (reference: layers3d.py:225-243 MyConv3d).

    Input (B, H, W, Cin*N) channel-major -> conv3d over (N, H, W) -> output
    (B, H, W, Cout*N) channel-major. `in/out_planes` are folded counts.
    """

    in_planes: int
    out_planes: int
    kernel: int = 3
    n_frames: int = 1
    init_scale: float = 1.0
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        N = self.n_frames
        Cin = self.in_planes // N
        Cout = self.out_planes // N
        B, H, W, _ = x.shape
        # (B,H,W,Cin,N) -> (B,N,H,W,Cin)
        xr = x.reshape(B, H, W, Cin, N).transpose(0, 4, 1, 2, 3)
        k = self.kernel
        pad = k // 2
        w = self.param("weight", default_init(self.init_scale), (k, k, k, Cin, Cout))
        y = jax.lax.conv_general_dilated(
            xr,
            w,
            window_strides=(1, 1, 1),
            padding=[(pad, pad)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (Cout,))
            y = y + b
        # (B,N,H,W,Cout) -> (B,H,W,Cout,N) -> fold
        return y.transpose(0, 2, 3, 4, 1).reshape(B, H, W, Cout * N)


class PseudoConv3dFolded(nn.Module):
    """Factorized space Conv2d -> act -> time Conv1d
    (reference: layers3d.py:257-299 PseudoConv3d)."""

    in_planes: int
    out_planes: int
    kernel: int = 3
    n_frames: int = 1
    init_scale: float = 1.0
    bias: bool = True
    act: Optional[Act] = None

    @nn.compact
    def __call__(self, x):
        N = self.n_frames
        Cin = self.in_planes // N
        Cout = self.out_planes // N
        B, H, W, _ = x.shape
        k = self.kernel
        pad = k // 2
        # space conv over (B*N, H, W, Cin)
        xr = (
            x.reshape(B, H, W, Cin, N)
            .transpose(0, 4, 1, 2, 3)
            .reshape(B * N, H, W, Cin)
        )
        xr = nn.Conv(
            Cout,
            (k, k),
            padding=[(pad, pad)] * 2,
            use_bias=self.bias,
            kernel_init=default_init(self.init_scale),
            name="space_conv",
        )(xr)
        if self.act is not None:
            xr = self.act(xr)
        # time conv over (B*H*W, N, Cout)
        xr = xr.reshape(B, N, H, W, Cout).transpose(0, 2, 3, 1, 4).reshape(
            B * H * W, N, Cout
        )
        xr = nn.Conv(
            Cout,
            (k,),
            padding=[(pad, pad)],
            use_bias=self.bias,
            kernel_init=default_init(self.init_scale),
            name="time_conv",
        )(xr)
        # back to folded channel-major
        return (
            xr.reshape(B, H, W, N, Cout).transpose(0, 1, 2, 4, 3).reshape(B, H, W, Cout * N)
        )


class FrameConverter(nn.Module):
    """1x1 linear map over the frame axis: (..., C, N_in) -> (..., C, N_out).

    Covers both the reference's 2D conv1x1 frame converters applied to
    (B*C, N, H, W) (ncsnpp_more.py:215-218, 327-334) and MySPADE's 1x1 Conv3d
    segmap converter (layerspp.py:146-149, 160-163). Bias is per output frame.
    """

    n_in: int
    n_out: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C*N_in) channel-major
        B, H, W, CN = x.shape
        C = CN // self.n_in
        W_p = self.param("weight", default_init(self.init_scale), (self.n_in, self.n_out))
        b = self.param("bias", nn.initializers.zeros, (self.n_out,))
        xr = x.reshape(B, H, W, C, self.n_in)
        y = jnp.tensordot(xr, W_p, axes=[[4], [0]]) + b
        return y.reshape(B, H, W, C * self.n_out)


def make_convs(mode: str, n_frames: int, act: Optional[Act]):
    """Return (conv3x3, conv1x1) factories for the given conv family.
    Mirrors the functools.partial dance in the reference
    (ncsnpp_more.py:101-110, layerspp.py:560-575)."""
    if mode == "pseudo3d":
        def c3(in_p, out_p, init_scale=1.0, name=None):
            return PseudoConv3dFolded(
                in_planes=in_p, out_planes=out_p, kernel=3, n_frames=n_frames,
                init_scale=init_scale, act=act, name=name,
            )

        def c1(in_p, out_p, init_scale=1.0, name=None):
            return PseudoConv3dFolded(
                in_planes=in_p, out_planes=out_p, kernel=1, n_frames=n_frames,
                init_scale=init_scale, act=act, name=name,
            )

    elif mode == "3d":
        def c3(in_p, out_p, init_scale=1.0, name=None):
            return Conv3dFolded(
                in_planes=in_p, out_planes=out_p, kernel=3, n_frames=n_frames,
                init_scale=init_scale, name=name,
            )

        def c1(in_p, out_p, init_scale=1.0, name=None):
            return Conv3dFolded(
                in_planes=in_p, out_planes=out_p, kernel=1, n_frames=n_frames,
                init_scale=init_scale, name=name,
            )

    else:  # 2d
        def c3(in_p, out_p, init_scale=1.0, name=None):
            return Conv2dSame(out_ch=out_p, kernel=3, init_scale=init_scale, name=name)

        def c1(in_p, out_p, init_scale=1.0, name=None):
            return Conv2dSame(out_ch=out_p, kernel=1, init_scale=init_scale, name=name)

    return c3, c1


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


class AttnBlock(nn.Module):
    """Multi-head self-attention over flattened spatial tokens
    (reference: layerspp.py:207-249 AttnBlockpp; layers3d.py AttnBlockpp1d is
    the same math over a 1-D token axis).

    Input (B, ..., C): all middle axes are flattened into tokens.
    """

    channels: int
    skip_rescale: bool = True
    init_scale: float = 0.0
    n_heads: int = 1
    n_head_channels: int = -1

    @nn.compact
    def __call__(self, x):
        C = self.channels
        if self.n_head_channels == -1:
            n_heads = self.n_heads
        elif C < self.n_head_channels:
            n_heads = 1
        else:
            assert C % self.n_head_channels == 0
            n_heads = C // self.n_head_channels

        shape = x.shape
        B = shape[0]
        h = GroupNorm(channels=C, eps=1e-6, name="GroupNorm_0")(x)
        # q/k/v as ONE matmul (C -> 3C): triples the MXU lane fill vs three
        # C->C matmuls; params stay three separate NINs for checkpoint parity
        Wq, bq = NIN(C, name="NIN_0")(h, return_params=True)
        Wk, bk = NIN(C, name="NIN_1")(h, return_params=True)
        Wv, bv = NIN(C, name="NIN_2")(h, return_params=True)
        W_qkv = jnp.concatenate([Wq, Wk, Wv], axis=1).astype(h.dtype)
        b_qkv = jnp.concatenate([bq, bk, bv]).astype(h.dtype)
        qkv = jnp.tensordot(h, W_qkv, axes=1) + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        hd = C // n_heads
        tokens = int(np.prod(shape[1:-1]))
        q = q.reshape(B, tokens, n_heads, hd)
        k = k.reshape(B, tokens, n_heads, hd)
        v = v.reshape(B, tokens, n_heads, hd)

        from .. import ops as _ops

        if _ops.use_pallas("attention"):
            # fused single-block attention kernel (ops/attention.py).
            # bf16 input casts were measured ~25% faster at the kernel level
            # but neutral end-to-end (cast/transpose overhead); keep f32.
            qh = q.transpose(0, 2, 1, 3).reshape(B * n_heads, tokens, hd)
            kh = k.transpose(0, 2, 1, 3).reshape(B * n_heads, tokens, hd)
            vh = v.transpose(0, 2, 1, 3).reshape(B * n_heads, tokens, hd)
            oh = _ops.attention.fused_attention(qh, kh, vh, hd ** -0.5)
            h = (
                oh.reshape(B, n_heads, tokens, hd)
                .transpose(0, 2, 1, 3)
                .reshape(shape)
            )
        else:
            w = jnp.einsum("bqhc,bkhc->bhqk", q, k) * (hd ** -0.5)
            w = jax.nn.softmax(w, axis=-1)
            h = jnp.einsum("bhqk,bkhc->bqhc", w, v).reshape(shape)
        h = NIN(C, init_scale=self.init_scale, name="NIN_3")(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class AttnBlock3d(nn.Module):
    """Factorized space-then-time attention over the folded layout
    (reference: layers3d.py:191-223 AttnBlockpp3d)."""

    channels: int  # folded C*N
    n_frames: int
    skip_rescale: bool = True
    init_scale: float = 0.0
    n_heads: int = 1
    n_head_channels: int = -1
    act: Optional[Act] = None

    @nn.compact
    def __call__(self, x):
        N = self.n_frames
        C = self.channels // N
        B, H, W, _ = x.shape
        # space attention over (B*N, H, W, C)
        xr = x.reshape(B, H, W, C, N).transpose(0, 4, 1, 2, 3).reshape(B * N, H, W, C)
        xr = AttnBlock(
            channels=C,
            skip_rescale=self.skip_rescale,
            init_scale=self.init_scale,
            n_heads=self.n_heads,
            n_head_channels=self.n_head_channels,
            name="space_att",
        )(xr)
        if self.act is not None:
            xr = self.act(xr)
        # time attention over (B*H*W, N, C)
        xr = xr.reshape(B, N, H, W, C).transpose(0, 2, 3, 1, 4).reshape(B * H * W, N, C)
        xr = AttnBlock(
            channels=C,
            skip_rescale=self.skip_rescale,
            init_scale=self.init_scale,
            n_heads=self.n_heads,
            n_head_channels=self.n_head_channels,
            name="time_att",
        )(xr)
        return (
            xr.reshape(B, H, W, N, C).transpose(0, 1, 2, 4, 3).reshape(B, H, W, C * N)
        )


class AttnBlock3dFull(nn.Module):
    """Full joint space-time attention over the folded layout
    (reference: layers3d.py:139-189 AttnBlockpp3d_old — abandoned upstream
    for memory; kept here as a working, selectable variant).

    The reference flattens (N, H, W) into one token axis and runs the
    standard AttnBlockpp math over it; on TPU that is exactly AttnBlock with
    the frame axis folded into the token axes, so the O((NHW)^2) score matrix
    stays a single large MXU matmul. Use only at coarse resolutions — the
    memory wall that killed it upstream (9 GB/block at 64px) is physics, not
    a torch artifact.
    """

    channels: int  # folded C*N
    n_frames: int
    skip_rescale: bool = True
    init_scale: float = 0.0
    n_heads: int = 1
    n_head_channels: int = -1
    act: Optional[Act] = None  # unused; kept for factory-signature parity

    @nn.compact
    def __call__(self, x):
        N = self.n_frames
        C = self.channels // N
        B, H, W, _ = x.shape
        # channel-major fold (c*N+n) -> (B, N, H, W, C): AttnBlock flattens
        # all middle axes, giving tokens = N*H*W like the reference's
        # bnhwijk einsum pair (layers3d.py:177-182).
        xr = x.reshape(B, H, W, C, N).transpose(0, 4, 1, 2, 3)
        xr = AttnBlock(
            channels=C,
            skip_rescale=self.skip_rescale,
            init_scale=self.init_scale,
            n_heads=self.n_heads,
            n_head_channels=self.n_head_channels,
            name="att",
        )(xr)
        return xr.transpose(0, 2, 3, 4, 1).reshape(B, H, W, C * N)


# ---------------------------------------------------------------------------
# SPADE
# ---------------------------------------------------------------------------


class MySPADE(nn.Module):
    """Space-time adaptive normalization (reference: layerspp.py:101-173).

    GroupNorm(affine=False) on x, then gamma/beta predicted by convs over the
    nearest-resized cond frames: out = norm(x) * (1 + gamma) + beta.

    3D family: the segmap is first mapped from num_frames_cond (Nc) to
    num_frames (N) frames by `conv1x1_cond` — a 1x1 conv of the model's conv
    family applied with the image-channel axis playing the frame role
    (reference: layerspp.py:146-149, 157-163); the mlp convs are 3d/pseudo3d.
    """

    norm_nc: int          # channels normalized (true channels, not folded)
    label_nc: int         # cond channels (folded C_img*Nc)
    act: Act
    conv3x3: Any          # conv factory (in, out, init_scale=..., name=...)
    conv1x1_cond: Any = None  # converter factory (3D family only)
    spade_dim: int = 128
    is3d: bool = False
    num_frames: int = 1
    num_frames_cond: int = 0

    @nn.compact
    def __call__(self, x, segmap):
        N = self.num_frames if self.is3d else 1
        normalized = group_norm(
            x, num_groups_for(self.norm_nc), eps=1e-6, frames_last=N
        )

        if self.is3d:
            # (B,H,W,C_img*Nc) channel-major -> (Nc,C_img)-folded, converter
            # maps Nc -> N frames, back to channel-major (C_img, N).
            B, H, W, CNc = segmap.shape
            C_img = CNc // self.num_frames_cond
            seg = (
                segmap.reshape(B, H, W, C_img, self.num_frames_cond)
                .transpose(0, 1, 2, 4, 3)
                .reshape(B, H, W, CNc)
            )
            seg = self.conv1x1_cond(
                self.label_nc, C_img * self.num_frames, name="converter"
            )(seg)
            segmap = (
                seg.reshape(B, H, W, self.num_frames, C_img)
                .transpose(0, 1, 2, 4, 3)
                .reshape(B, H, W, C_img * self.num_frames)
            )
            label_in = C_img * self.num_frames
        else:
            label_in = self.label_nc

        segmap = nearest_resize(segmap, x.shape[1:3])
        hidden = self.spade_dim // N * N
        actv = self.act(self.conv3x3(label_in, hidden, name="mlp_shared")(segmap))
        gamma = self.conv3x3(hidden, self.norm_nc * N, name="mlp_gamma")(actv)
        beta = self.conv3x3(hidden, self.norm_nc * N, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


# ---------------------------------------------------------------------------
# get_act_norm: AdaGN / SPADE + activation
# ---------------------------------------------------------------------------


class ActNorm(nn.Module):
    """norm -> (AdaGN scale/shift from temb) -> act
    (reference: layerspp.py:486-549 get_act_norm).

    With emb: GroupNorm(affine=False), Dense(temb) -> (scale, shift),
    x = norm(x)*(1+scale)+shift, then act. 3D family applies scale/shift per
    true channel (broadcast over frames).
    """

    act: Act
    norm: str  # 'group' | 'spade'
    ch: int    # folded channels
    emb_dim: Optional[int] = None
    is3d: bool = False
    n_frames: int = 1
    # spade extras
    num_frames_cond: int = 0
    cond_ch: int = 0
    spade_dim: int = 128
    conv3x3: Any = None
    conv1x1_cond: Any = None

    @nn.compact
    def __call__(self, x, emb=None, cond=None):
        N = self.n_frames if self.is3d else 1
        C = self.ch // N  # true channels

        def apply_norm(x, affine: bool):
            if self.norm == "spade":
                return MySPADE(
                    norm_nc=C,
                    label_nc=self.cond_ch,
                    act=self.act,
                    conv3x3=self.conv3x3,
                    conv1x1_cond=self.conv1x1_cond,
                    spade_dim=self.spade_dim,
                    is3d=self.is3d,
                    num_frames=self.n_frames,
                    num_frames_cond=self.num_frames_cond,
                    name="Norm_0",
                )(x, cond)
            gamma = beta = None
            if affine:
                gamma = self.param("Norm_0_scale", nn.initializers.ones, (C,))
                beta = self.param("Norm_0_bias", nn.initializers.zeros, (C,))
            # reference uses eps=1e-5 via get_norm here (layerspp.py:475-478)
            return group_norm(
                x, num_groups_for(C), eps=1e-5, gamma=gamma, beta=beta, frames_last=N
            )

        if emb is not None:
            emb_out = nn.Dense(
                2 * C, kernel_init=default_init(), name="Dense_0"
            )(self.act(emb))
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            from .. import ops as _ops

            if (
                _ops.use_pallas("groupnorm")
                and self.norm == "group"
                and self.act is jax.nn.silu
            ):
                # fused GN + AdaGN + SiLU Pallas kernel (one HBM round-trip)
                N_ = self.n_frames if self.is3d else 1
                scale_cn = jnp.repeat(scale, N_, axis=-1) if N_ > 1 else scale
                shift_cn = jnp.repeat(shift, N_, axis=-1) if N_ > 1 else shift
                return _ops.groupnorm.fused_group_norm(
                    x, num_groups_for(C), eps=1e-5, scale=scale_cn,
                    shift=shift_cn, frames_last=N_, act=True,
                )
            if self.norm == "group":
                # XLA path: MXU-dot stats + one folded FMA (+SiLU when the
                # act is SiLU) — fuses into the consuming conv's input with
                # no pallas layout constraints (layers.group_norm_folded)
                scale_cn = jnp.repeat(scale, N, axis=-1) if N > 1 else scale
                shift_cn = jnp.repeat(shift, N, axis=-1) if N > 1 else shift
                fold_act = self.act is jax.nn.silu
                xn, _, _ = group_norm_folded(
                    x, num_groups_for(C), eps=1e-5, scale=scale_cn,
                    shift=shift_cn, frames_last=N, act=fold_act,
                )
                return xn if fold_act else self.act(xn)
            if self.is3d:
                B = x.shape[0]
                scale = scale.reshape(B, 1, 1, C, 1)
                shift = shift.reshape(B, 1, 1, C, 1)
                xn = apply_norm(x, affine=False)
                Bs, H, W, _ = xn.shape
                xn = xn.reshape(Bs, H, W, C, N)
                xn = xn * (1 + scale) + shift
                xn = xn.reshape(Bs, H, W, C * N)
            else:
                scale = scale[:, None, None, :]
                shift = shift[:, None, None, :]
                xn = apply_norm(x, affine=False)
                xn = xn * (1 + scale) + shift
        else:
            xn = apply_norm(x, affine=(self.norm != "spade"))
        return self.act(xn)


# ---------------------------------------------------------------------------
# Resampling modules (with learned conv)
# ---------------------------------------------------------------------------


class UpDownConv2d(nn.Module):
    """StyleGAN2 Conv2d with fused FIR up/down (reference:
    up_or_down_sampling.py:24-58)."""

    in_ch: int
    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", default_init(), (self.kernel, self.kernel, self.in_ch, self.out_ch)
        )
        if self.up:
            x = resample.upsample_conv_2d(x, w, k=list(self.resample_kernel))
        elif self.down:
            x = resample.conv_downsample_2d(x, w, k=list(self.resample_kernel))
        else:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1),
                padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            x = x + b
        return x


class Upsample(nn.Module):
    """Reference: layerspp.py:250-282."""

    in_ch: int
    out_ch: Optional[int] = None
    with_conv: bool = True
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch or self.in_ch
        if not self.fir:
            h = resample.naive_upsample_2d(x)
            if self.with_conv:
                h = Conv2dSame(out_ch, 3, name="Conv_0")(h)
        elif not self.with_conv:
            h = resample.upsample_2d(x, list(self.fir_kernel), factor=2)
        else:
            h = UpDownConv2d(
                self.in_ch, out_ch, 3, up=True,
                resample_kernel=self.fir_kernel, name="Conv2d_0",
            )(x)
        return h


class Downsample(nn.Module):
    """Reference: layerspp.py:285-319."""

    in_ch: int
    out_ch: Optional[int] = None
    with_conv: bool = True
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_ch or self.in_ch
        if not self.fir:
            if self.with_conv:
                # asymmetric pad + stride-2 VALID conv (reference pads (0,1,0,1))
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    kernel_init=default_init(), name="Conv_0",
                )(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        elif not self.with_conv:
            x = resample.downsample_2d(x, list(self.fir_kernel), factor=2)
        else:
            x = UpDownConv2d(
                self.in_ch, out_ch, 3, down=True,
                resample_kernel=self.fir_kernel, name="Conv2d_0",
            )(x)
        return x


# ---------------------------------------------------------------------------
# Residual blocks
# ---------------------------------------------------------------------------


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style resblock with AdaGN or SPADE norm (reference:
    layerspp.py:553-624 ResnetBlockBigGANppGN / :628-705 ...SPADE).

    actnorm0 -> [FIR up/down] -> conv3x3 -> actnorm1 -> dropout ->
    conv3x3(init 0) -> (+ 1x1 shortcut) / sqrt(2)
    """

    act: Act
    in_ch: int
    out_ch: Optional[int] = None
    temb_dim: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    conv_mode: str = "2d"  # '2d' | '3d' | 'pseudo3d'
    n_frames: int = 1
    act3d: bool = True
    # spade
    norm: str = "group"
    num_frames_cond: int = 0
    cond_ch: int = 0
    spade_dim: int = 128

    @nn.compact
    def __call__(self, x, temb=None, cond=None, train: bool = False):
        out_ch = self.out_ch or self.in_ch
        conv3x3_, conv1x1_ = make_convs(
            self.conv_mode, self.n_frames, self.act if self.act3d else None
        )
        spade_kwargs = {}
        if self.norm == "spade":
            img_ch = self.cond_ch // max(self.num_frames_cond, 1)
            _, conv1x1_cond = make_convs(
                self.conv_mode, img_ch, self.act if self.act3d else None
            )
            spade_kwargs = dict(
                num_frames_cond=self.num_frames_cond,
                cond_ch=self.cond_ch,
                spade_dim=self.spade_dim,
                conv3x3=conv3x3_,
                conv1x1_cond=conv1x1_cond,
            )
        h = ActNorm(
            act=self.act, norm=self.norm, ch=self.in_ch, emb_dim=self.temb_dim,
            is3d=(self.conv_mode != "2d"), n_frames=self.n_frames,
            name="actnorm0", **spade_kwargs,
        )(x, temb, cond)

        if self.up:
            if self.fir:
                h = resample.upsample_2d(h, list(self.fir_kernel), factor=2)
                x = resample.upsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = resample.naive_upsample_2d(h)
                x = resample.naive_upsample_2d(x)
        elif self.down:
            if self.fir:
                h = resample.downsample_2d(h, list(self.fir_kernel), factor=2)
                x = resample.downsample_2d(x, list(self.fir_kernel), factor=2)
            else:
                h = resample.naive_downsample_2d(h)
                x = resample.naive_downsample_2d(x)

        h = conv3x3_(self.in_ch, out_ch, name="Conv_0")(h)
        h = ActNorm(
            act=self.act, norm=self.norm, ch=out_ch, emb_dim=self.temb_dim,
            is3d=(self.conv_mode != "2d"), n_frames=self.n_frames,
            name="actnorm1", **spade_kwargs,
        )(h, temb, cond)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3_(out_ch, out_ch, init_scale=self.init_scale, name="Conv_1")(h)

        if self.in_ch != out_ch or self.up or self.down:
            x = conv1x1_(self.in_ch, out_ch, name="Conv_2")(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResnetBlockDDPM(nn.Module):
    """DDPM-style resblock (reference: layerspp.py:322-392 ResnetBlockDDPMpp /
    :395-462 ...SPADE). Norm -> act -> conv -> (+temb dense) -> norm -> act ->
    dropout -> conv -> (+NIN/conv shortcut)."""

    act: Act
    in_ch: int
    out_ch: Optional[int] = None
    temb_dim: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    conv_mode: str = "2d"
    n_frames: int = 1
    act3d: bool = False
    norm: str = "group"
    num_frames_cond: int = 0
    cond_ch: int = 0
    spade_dim: int = 128

    @nn.compact
    def __call__(self, x, temb=None, cond=None, train: bool = False):
        out_ch = self.out_ch or self.in_ch
        conv3x3_, conv1x1_ = make_convs(
            self.conv_mode, self.n_frames, self.act if self.act3d else None
        )
        is3d = self.conv_mode != "2d"
        N = self.n_frames if is3d else 1

        def norm_layer(ch, name):
            if self.norm == "spade":
                img_ch = self.cond_ch // max(self.num_frames_cond, 1)
                _, conv1x1_cond = make_convs(
                    self.conv_mode, img_ch, self.act if self.act3d else None
                )
                return functools.partial(
                    MySPADE(
                        norm_nc=ch // N if is3d else ch,
                        label_nc=self.cond_ch,
                        act=self.act,
                        conv3x3=conv3x3_,
                        conv1x1_cond=conv1x1_cond,
                        spade_dim=self.spade_dim,
                        is3d=is3d,
                        num_frames=self.n_frames,
                        num_frames_cond=self.num_frames_cond,
                        name=name,
                    ),
                    segmap=cond,
                )
            return GroupNorm(
                channels=ch // N if is3d else ch, eps=1e-6, frames_last=N, name=name
            )

        h = self.act(norm_layer(self.in_ch, "GroupNorm_0")(x))
        h = conv3x3_(self.in_ch, out_ch, name="Conv_0")(h)
        if temb is not None:
            dense = nn.Dense(out_ch, kernel_init=default_init(), name="Dense_0")
            h = h + dense(self.act(temb))[:, None, None, :]
        h = self.act(norm_layer(out_ch, "GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3_(out_ch, out_ch, init_scale=self.init_scale, name="Conv_1")(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = conv3x3_(self.in_ch, out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)

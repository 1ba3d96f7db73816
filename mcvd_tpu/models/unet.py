"""Legacy small UNet (arch='unet') in flax/NHWC.

Reference: models/unet.py (UNet:175, UNet_SMLD:301, UNet_DDPM:327). This is
the CPU-friendly arch of configs/smmnist_DDPM_small5.yml. Faithful quirks:
  * mode-based channel ladder (deep/deeper/deepest) — config.model.ch_mult is
    IGNORED by this arch (unet.py:199-205);
  * xavier-uniform init with gain sqrt(scale);
  * GroupNorm with a fixed 32 groups;
  * attention output REPLACES the resblock output in the skip stack
    (unet.py:277-281);
  * Dropout2d (whole-channel dropout) inside resblocks;
  * input is rescaled 2x-1 in-forward when data is not pre-rescaled
    (unet.py:270-271).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import get_timestep_embedding


def xavier_uniform_scaled(scale: float = 1.0):
    gain2 = 1e-10 if scale == 0 else scale
    # torch xavier_uniform: U(-a, a), a = gain*sqrt(6/(fan_in+fan_out))
    return jax.nn.initializers.variance_scaling(
        gain2, "fan_avg", "uniform"
    )


class Nin(nn.Module):
    channel_out: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):  # (B,H,W,C)
        C = x.shape[-1]
        # torch Nin weight is (out, in) xavier-initialized; fan axes differ from
        # our (in, out) layout only by symmetry of fan_avg — identical dist.
        W = self.param("weights", xavier_uniform_scaled(self.init_scale), (C, self.channel_out))
        b = self.param("bias", nn.initializers.zeros, (self.channel_out,))
        return jnp.tensordot(x, W, axes=1) + b


class GroupNorm32(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-6, name="gn")(x)


class ResnetBlock(nn.Module):
    channel_in: int
    channel_out: int
    dropout: float
    tembdim: int
    conditional: bool = False

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        act = jax.nn.silu
        h = act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="normalize0")(x))
        h = nn.Conv(
            self.channel_out, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=xavier_uniform_scaled(1.0), name="conv0",
        )(h)
        if temb is not None and self.conditional:
            h = h + nn.Dense(
                self.channel_out, kernel_init=xavier_uniform_scaled(1.0), name="dense"
            )(temb)[:, None, None, :]
        h = act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="normalize1")(h))
        # Dropout2d: drop whole channels (broadcast over H, W)
        h = nn.Dropout(
            self.dropout, deterministic=not train, broadcast_dims=(1, 2)
        )(h)
        h = nn.Conv(
            self.channel_out, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=xavier_uniform_scaled(1e-10), name="conv1",
        )(h)
        if self.channel_in != self.channel_out:
            x = Nin(self.channel_out, name="nin")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head attention with 1/sqrt(C) scaling (reference: unet.py:100-122)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="normalize")(x)
        q = Nin(C, name="Q")(h)
        k = Nin(C, name="K")(h)
        v = Nin(C, name="V")(h)
        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        w = jnp.einsum("bqc,bkc->bqk", q, k) / math.sqrt(C)
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
        h = Nin(C, init_scale=0.0, name="OUT")(h)
        return x + h


class Upsample(nn.Module):
    channel: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(
            self.channel, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=xavier_uniform_scaled(1.0), name="conv",
        )(x)


class UNet(nn.Module):
    config: Any

    def setup(self):
        config = self.config
        self.n_channels = config.data.channels
        self.ch = ch = config.model.ngf
        self.mode = getattr(config, "mode", "deep")
        self.drop = getattr(config.model, "dropout", 0.0)
        self.time_conditional = getattr(config.model, "time_conditional", False)
        self.logit_transform = config.data.logit_transform
        self.rescaled = config.data.rescaled
        self.num_frames = getattr(config.data, "num_frames", 1)
        self.num_frames_cond = getattr(config.data, "num_frames_cond", 0) + getattr(
            config.data, "num_frames_future", 0
        )
        self.output_all_frames = getattr(config.model, "output_all_frames", False)

        if self.mode == "deepest":
            ch_mult = [ch * n for n in (1, 2, 2, 2, 4, 4)]
        elif self.mode == "deeper":
            ch_mult = [ch * n for n in (1, 2, 2, 4, 4)]
        else:
            ch_mult = [ch * n for n in (1, 2, 2, 2)]
        self.ch_ladder = ch_mult

        def RB(cin, cout):
            return ResnetBlock(
                cin, cout, dropout=self.drop, tembdim=ch * 4,
                conditional=self.time_conditional,
            )

        down = [("conv", nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                                 kernel_init=xavier_uniform_scaled(1.0)))]
        prev_ch = ch_mult[0]
        ch_size = [ch]
        for i, ich in enumerate(ch_mult):
            for firstarg in (prev_ch, ich):
                down.append(("res", RB(firstarg, ich)))
                ch_size.append(ich)
                if i == 1:
                    down.append(("attn", AttnBlock(ich)))
            if i != len(ch_mult) - 1:
                down.append(
                    ("conv", nn.Conv(ich, (3, 3), strides=(2, 2),
                                     padding=[(1, 1), (1, 1)],
                                     kernel_init=xavier_uniform_scaled(1.0)))
                )
                ch_size.append(ich)
            prev_ch = ich
        self.downblocks = [m for _, m in down]
        self._down_kinds = [k for k, _ in down]

        self.middleblocks = [RB(ch_mult[-1], ch_mult[-1]), AttnBlock(ch_mult[-1]),
                             RB(ch_mult[-1], ch_mult[-1])]
        self._mid_kinds = ["res", "attn", "res"]

        up = []
        prev_ich = ch_mult[-1]
        for i, ich in reversed(list(enumerate(ch_mult))):
            for _ in range(3):
                up.append(("res", RB(prev_ich + ch_size.pop(), ich)))
                if i == 1:
                    up.append(("attn", AttnBlock(ich)))
                prev_ich = ich
            if i != 0:
                up.append(("up", Upsample(ich)))
        self.upblocks = [m for _, m in up]
        self._up_kinds = [k for k, _ in up]

        out_ch = (
            self.n_channels * (self.num_frames + self.num_frames_cond)
            if self.output_all_frames
            else self.n_channels * self.num_frames
        )
        self.normalize = nn.GroupNorm(num_groups=32, epsilon=1e-6)
        self.out = nn.Conv(out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=xavier_uniform_scaled(1e-10))
        self.temb_dense_0 = nn.Dense(ch * 4, kernel_init=xavier_uniform_scaled(1.0))
        self.temb_dense_1 = nn.Dense(ch * 4, kernel_init=xavier_uniform_scaled(1.0))

    def __call__(self, x, y=None, cond=None, train: bool = False):
        act = jax.nn.silu
        if y is not None and self.time_conditional:
            temb = get_timestep_embedding(y, self.ch)
            temb = act(self.temb_dense_1(act(self.temb_dense_0(temb))))
        else:
            temb = None

        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)

        if not self.logit_transform and not self.rescaled:
            x = 2 * x - 1.0

        hs = []
        for kind, module in zip(self._down_kinds, self.downblocks):
            if kind == "res":
                x = module(x, temb, train=train)
            else:
                x = module(x)
            if kind == "attn":
                hs.pop()
            hs.append(x)

        for kind, module in zip(self._mid_kinds, self.middleblocks):
            x = module(x, temb, train=train) if kind == "res" else module(x)

        for kind, module in zip(self._up_kinds, self.upblocks):
            if kind == "res":
                x = module(jnp.concatenate([x, hs.pop()], axis=-1), temb, train=train)
            else:
                x = module(x)

        x = act(self.normalize(x))
        output = self.out(x)

        if self.output_all_frames and cond is not None:
            output = output[..., self.num_frames_cond * self.n_channels:]
        return output


class UNetLegacy(nn.Module):
    """UNet_SMLD / UNet_DDPM wrapper (reference: models/unet.py:301-380).
    noise_in_cond perturbs cond at the same labels with an explicit rng."""

    config: Any

    def setup(self):
        self.version = getattr(self.config.model, "version", "SMLD").upper()
        self.unet = UNet(self.config)
        self.noise_in_cond = getattr(self.config.model, "noise_in_cond", False)

    def __call__(self, x, y, cond=None, cond_mask=None, *, sched=None, rng=None,
                 train: bool = False):
        if self.noise_in_cond and cond is not None:
            assert sched is not None and rng is not None
            shape1 = (cond.shape[0],) + (1,) * (cond.ndim - 1)
            z = jax.random.normal(rng, cond.shape, dtype=cond.dtype)
            if self.version == "SMLD":
                sigmas = jnp.asarray(sched.sigmas)
                cond = cond + sigmas[y].reshape(shape1) * z
            else:
                alphas = jnp.asarray(sched.alphas)
                used = alphas[y].reshape(shape1)
                cond = jnp.sqrt(used) * cond + jnp.sqrt(1.0 - used) * z
        return self.unet(x, y, cond, train=train)

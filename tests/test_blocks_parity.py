"""Numerical parity of NN blocks vs torch oracles implementing the reference
equations (reference: models/better/layerspp.py, layers.py). Weights are
copied from the flax params into the torch oracle, then outputs compared."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mcvd_tpu.models import blocks
from mcvd_tpu.models.layers import GroupNorm, NIN, get_timestep_embedding, group_norm, num_groups_for


def to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.permute(0, 2, 3, 1).contiguous().numpy())


def to_nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def test_group_norm_matches_torch():
    for C in (8, 12, 64, 6):
        g = num_groups_for(C)
        x = torch.randn(2, C, 5, 5, generator=torch.Generator().manual_seed(C))
        gamma = torch.randn(C, generator=torch.Generator().manual_seed(C + 1))
        beta = torch.randn(C, generator=torch.Generator().manual_seed(C + 2))
        ref = F.group_norm(x, g, gamma, beta, eps=1e-6)
        got = group_norm(
            to_nhwc(x), g, eps=1e-6,
            gamma=jnp.asarray(gamma.numpy()), beta=jnp.asarray(beta.numpy()),
        )
        np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_group_norm_3d_frames_last():
    """3D family: stats over (group-ch, N, H, W) like torch GroupNorm on
    (B, C, N, H, W)."""
    C, N = 8, 3
    g = num_groups_for(C)
    x5 = torch.randn(2, C, N, 5, 5, generator=torch.Generator().manual_seed(0))
    ref = F.group_norm(x5, g, eps=1e-6)
    # our layout: (B,H,W,C*N) channel-major
    x_folded = x5.permute(0, 3, 4, 1, 2).reshape(2, 5, 5, C * N)
    got = group_norm(jnp.asarray(x_folded.numpy()), g, eps=1e-6, frames_last=N)
    got5 = np.asarray(got).reshape(2, 5, 5, C, N).transpose(0, 3, 4, 1, 2)
    np.testing.assert_allclose(got5, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_torch():
    ts = torch.tensor([0, 1, 5, 999])
    for dim in (32, 64):
        half = dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half, dtype=torch.float) * -emb)
        emb = ts.float()[:, None] * emb[None, :]
        ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
        got = get_timestep_embedding(jnp.asarray(ts.numpy()), dim)
        # f32 ulp differences in the frequency table are amplified by t~1000
        # inside sin/cos; 2e-3 is the float32 phase-reproducibility limit.
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=2e-3)


class TorchAttnOracle(torch.nn.Module):
    """Reference AttnBlockpp math (layerspp.py:207-249)."""

    def __init__(self, C, n_head_channels):
        super().__init__()
        self.C = C
        self.n_heads = 1 if C < n_head_channels else C // n_head_channels
        g = num_groups_for(C)
        self.gn = torch.nn.GroupNorm(g, C, eps=1e-6)
        self.W = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(C, C)) for _ in range(4)]
        )
        self.b = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(C)) for _ in range(4)]
        )

    def nin(self, x, i):
        # x (B,C,H,W); W (in,out)
        return torch.einsum("bchw,cd->bdhw", x, self.W[i]) + self.b[i][None, :, None, None]

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.gn(x)
        q, k, v = self.nin(h, 0), self.nin(h, 1), self.nin(h, 2)
        Ch = C // self.n_heads
        q = q.reshape(B * self.n_heads, Ch, H, W)
        k = k.reshape(B * self.n_heads, Ch, H, W)
        v = v.reshape(B * self.n_heads, Ch, H, W)
        w = torch.einsum("bchw,bcij->bhwij", q, k) * (Ch ** -0.5)
        w = w.reshape(B * self.n_heads, H, W, H * W)
        w = F.softmax(w, dim=-1)
        w = w.reshape(B * self.n_heads, H, W, H, W)
        h = torch.einsum("bhwij,bcij->bchw", w, v)
        h = h.reshape(B, C, H, W)
        h = self.nin(h, 3)
        return (x + h) / np.sqrt(2.0)


def test_attention_matches_torch():
    C, Hd = 16, 8
    x = torch.randn(2, C, 8, 8, generator=torch.Generator().manual_seed(0))
    attn = blocks.AttnBlock(channels=C, n_head_channels=Hd)
    params = jax.jit(attn.init)(jax.random.PRNGKey(0), to_nhwc(x))
    p = params["params"]

    oracle = TorchAttnOracle(C, Hd)
    with torch.no_grad():
        oracle.gn.weight.copy_(t(p["GroupNorm_0"]["scale"]))
        oracle.gn.bias.copy_(t(p["GroupNorm_0"]["bias"]))
        for i, name in enumerate(["NIN_0", "NIN_1", "NIN_2", "NIN_3"]):
            oracle.W[i].copy_(t(p[name]["W"]))
            oracle.b[i].copy_(t(p[name]["b"]))
        ref = oracle(x)

    got = jax.jit(attn.apply)(params, to_nhwc(x))
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=5e-4, atol=5e-5)


class TorchAttn3dFullOracle(torch.nn.Module):
    """Reference AttnBlockpp3d_old INTENT (layers3d.py:139-189).

    The block as written crashes for n_frames>1: its score einsum
    'bcnhw,bcnij->bnhwij' (layers3d.py:177) shares the frame axis between q
    and k, so the reshape to (B*h, N, H, W, N*H*W) at :179 mismatches by a
    factor of N (RuntimeError, verified against /root/reference). The
    surrounding reshape/softmax/reshape/einsum chain shows the intended math
    is full joint attention over N*H*W tokens; this oracle fixes the score
    einsum to 'bcnhw,bcijk->bnhwijk' and is anchored to the verified
    AttnBlockpp oracle at N=1, where the upstream bug is inert."""

    def __init__(self, C, N, n_head_channels):
        super().__init__()
        self.C, self.N = C, N
        self.n_heads = 1 if C < n_head_channels else C // n_head_channels
        self.gn = torch.nn.GroupNorm(num_groups_for(C), C, eps=1e-6)
        self.W = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(C, C)) for _ in range(4)]
        )
        self.b = torch.nn.ParameterList(
            [torch.nn.Parameter(torch.zeros(C)) for _ in range(4)]
        )

    def nin(self, x, i):
        # x (B,C,N,H,W); W (in,out)  [NIN3d, layers3d.py:118-135]
        return (
            torch.einsum("bcnhw,cd->bdnhw", x, self.W[i])
            + self.b[i][None, :, None, None, None]
        )

    def forward(self, x):  # x: (B, C*N, H, W) channel-major fold
        B, CN, H, W = x.shape
        C, N = self.C, self.N
        x = x.reshape(B, C, N, H, W)
        h = self.gn(x)
        q, k, v = self.nin(h, 0), self.nin(h, 1), self.nin(h, 2)
        Ch = C // self.n_heads
        q = q.reshape(B * self.n_heads, Ch, N, H, W)
        k = k.reshape(B * self.n_heads, Ch, N, H, W)
        v = v.reshape(B * self.n_heads, Ch, N, H, W)
        w = torch.einsum("bcnhw,bcijk->bnhwijk", q, k) * (Ch ** -0.5)
        w = w.reshape(B * self.n_heads, N, H, W, N * H * W)
        w = F.softmax(w, dim=-1)
        w = w.reshape(B * self.n_heads, N, H, W, N, H, W)
        h = torch.einsum("bnhwijk,bcijk->bcnhw", w, v)
        h = h.reshape(B, C, N, H, W)
        h = self.nin(h, 3)
        x = (x + h) / np.sqrt(2.0)  # skip_rescale=True path
        return x.reshape(B, CN, H, W)


def _rand_attn_weights(C, seed):
    g = torch.Generator().manual_seed(seed)
    return (
        [torch.randn(C, C, generator=g) * 0.2 for _ in range(4)],
        [torch.randn(C, generator=g) * 0.1 for _ in range(4)],
        torch.randn(C, generator=g) * 0.2 + 1.0,  # gn scale
        torch.randn(C, generator=g) * 0.1,  # gn bias
    )


def test_attn3d_full_oracle_anchored_at_n1():
    """At N=1 the intended AttnBlockpp3d_old math degenerates to AttnBlockpp;
    anchor the fixed-einsum oracle to the verified 2D oracle there."""
    C, Hd = 16, 8
    Ws, bs, gs, gb = _rand_attn_weights(C, 7)
    o3d = TorchAttn3dFullOracle(C, 1, Hd)
    o2d = TorchAttnOracle(C, Hd)
    with torch.no_grad():
        for o in (o3d, o2d):
            o.gn.weight.copy_(gs)
            o.gn.bias.copy_(gb)
            for i in range(4):
                o.W[i].copy_(Ws[i])
                o.b[i].copy_(bs[i])
        x = torch.randn(2, C, 6, 6, generator=torch.Generator().manual_seed(1))
        np.testing.assert_allclose(
            o3d(x).numpy(), o2d(x).numpy(), rtol=1e-5, atol=1e-6
        )


def test_attention_3d_full_matches_torch():
    """AttnBlock3dFull vs the intended-reference oracle at N=3, multi-head,
    with randomized weights (init_scale=0 leaves NIN_3 ~ zero, which would
    let a broken attention path pass — so weights are explicitly random)."""
    C, N, Hd = 16, 3, 8
    x = torch.randn(2, C * N, 6, 6, generator=torch.Generator().manual_seed(0))

    attn = blocks.AttnBlock3dFull(channels=C * N, n_frames=N, n_head_channels=Hd)
    params = jax.jit(attn.init)(jax.random.PRNGKey(0), to_nhwc(x))
    Ws, bs, gs, gb = _rand_attn_weights(C, 11)
    p = jax.tree_util.tree_map(lambda a: a, params)  # shallow-copyable pytree
    inner = p["params"]["att"]
    inner["GroupNorm_0"]["scale"] = jnp.asarray(gs.numpy())
    inner["GroupNorm_0"]["bias"] = jnp.asarray(gb.numpy())
    for i in range(4):
        inner[f"NIN_{i}"]["W"] = jnp.asarray(Ws[i].numpy())
        inner[f"NIN_{i}"]["b"] = jnp.asarray(bs[i].numpy())

    oracle = TorchAttn3dFullOracle(C, N, Hd)
    with torch.no_grad():
        oracle.gn.weight.copy_(gs)
        oracle.gn.bias.copy_(gb)
        for i in range(4):
            oracle.W[i].copy_(Ws[i])
            oracle.b[i].copy_(bs[i])
        ref = oracle(x)

    got = jax.jit(attn.apply)(p, to_nhwc(x))
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=5e-4, atol=5e-5)


class TorchBigGANResBlockOracle(torch.nn.Module):
    """Reference ResnetBlockBigGANppGN math (layerspp.py:553-624) with AdaGN
    (get_act_norm, layerspp.py:486-549), 2D, fir kernel [1,3,3,1]."""

    def __init__(self, in_ch, out_ch, temb_dim, up=False, down=False):
        super().__init__()
        self.up, self.down = up, down
        self.in_ch, self.out_ch = in_ch, out_ch
        self.gn0 = torch.nn.GroupNorm(num_groups_for(in_ch), in_ch, eps=1e-5, affine=False)
        self.gn1 = torch.nn.GroupNorm(num_groups_for(out_ch), out_ch, eps=1e-5, affine=False)
        self.dense0 = torch.nn.Linear(temb_dim, 2 * in_ch)
        self.dense1 = torch.nn.Linear(temb_dim, 2 * out_ch)
        self.conv0 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.conv1 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(in_ch, out_ch, 1)

    def actnorm(self, x, temb, gn, dense):
        emb_out = dense(F.silu(temb))[:, :, None, None]
        scale, shift = torch.chunk(emb_out, 2, dim=1)
        return F.silu(gn(x) * (1 + scale) + shift)

    def fir_resample(self, x, up):
        import sys
        sys.path.insert(0, "tests")
        from test_resample import torch_upfirdn2d
        from mcvd_tpu.models.resample import setup_kernel
        k = torch.tensor(setup_kernel([1.0, 3.0, 3.0, 1.0]))
        if up:
            return torch_upfirdn2d(x, k * 4.0, up=2, pad=(2, 1))
        return torch_upfirdn2d(x, k, down=2, pad=(1, 1))

    def forward(self, x, temb):
        h = self.actnorm(x, temb, self.gn0, self.dense0)
        if self.up:
            h = self.fir_resample(h, True)
            x = self.fir_resample(x, True)
        elif self.down:
            h = self.fir_resample(h, False)
            x = self.fir_resample(x, False)
        h = self.conv0(h)
        h = self.actnorm(h, temb, self.gn1, self.dense1)
        h = self.conv1(h)
        if self.in_ch != self.out_ch or self.up or self.down:
            x = self.conv2(x)
        return (x + h) / np.sqrt(2.0)


def _copy_conv(torch_conv, flax_conv_params):
    with torch.no_grad():
        torch_conv.weight.copy_(t(flax_conv_params["kernel"]).permute(3, 2, 0, 1))
        torch_conv.bias.copy_(t(flax_conv_params["bias"]))


def _copy_dense(torch_lin, flax_dense_params):
    with torch.no_grad():
        torch_lin.weight.copy_(t(flax_dense_params["kernel"]).permute(1, 0))
        torch_lin.bias.copy_(t(flax_dense_params["bias"]))


import pytest


@pytest.mark.parametrize("up,down,in_ch,out_ch", [
    (False, False, 16, 24),
    (True, False, 16, 16),
    (False, True, 16, 16),
])
def test_biggan_resblock_matches_torch(up, down, in_ch, out_ch):
    temb_dim = 32
    x = torch.randn(2, in_ch, 8, 8, generator=torch.Generator().manual_seed(0))
    temb_t = torch.randn(2, temb_dim, generator=torch.Generator().manual_seed(1))

    block = blocks.ResnetBlockBigGAN(
        act=jax.nn.silu, in_ch=in_ch, out_ch=out_ch, temb_dim=temb_dim,
        up=up, down=down, dropout=0.0,
    )
    params = jax.jit(block.init)(
        jax.random.PRNGKey(0), to_nhwc(x), jnp.asarray(temb_t.numpy())
    )
    p = params["params"]

    oracle = TorchBigGANResBlockOracle(in_ch, out_ch, temb_dim, up, down)
    _copy_dense(oracle.dense0, p["actnorm0"]["Dense_0"])
    _copy_dense(oracle.dense1, p["actnorm1"]["Dense_0"])
    _copy_conv(oracle.conv0, p["Conv_0"])
    _copy_conv(oracle.conv1, p["Conv_1"])
    if in_ch != out_ch or up or down:
        _copy_conv(oracle.conv2, p["Conv_2"])
    with torch.no_grad():
        ref = oracle(x, temb_t)

    got = jax.jit(block.apply)(params, to_nhwc(x), jnp.asarray(temb_t.numpy()))
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=5e-4, atol=5e-5)


class TorchSPADEOracle(torch.nn.Module):
    """Reference MySPADE 2D math (layerspp.py:101-173)."""

    def __init__(self, norm_nc, label_nc, spade_dim):
        super().__init__()
        self.gn = torch.nn.GroupNorm(num_groups_for(norm_nc), norm_nc, eps=1e-6, affine=False)
        self.mlp_shared = torch.nn.Conv2d(label_nc, spade_dim, 3, padding=1)
        self.mlp_gamma = torch.nn.Conv2d(spade_dim, norm_nc, 3, padding=1)
        self.mlp_beta = torch.nn.Conv2d(spade_dim, norm_nc, 3, padding=1)

    def forward(self, x, segmap):
        normalized = self.gn(x)
        segmap = F.interpolate(segmap, size=x.shape[2:], mode="nearest")
        actv = F.silu(self.mlp_shared(segmap))
        gamma = self.mlp_gamma(actv)
        beta = self.mlp_beta(actv)
        return normalized * (1 + gamma) + beta


def test_myspade_2d_matches_torch():
    norm_nc, label_nc, spade_dim = 16, 4, 8
    x = torch.randn(2, norm_nc, 8, 8, generator=torch.Generator().manual_seed(0))
    seg = torch.randn(2, label_nc, 16, 16, generator=torch.Generator().manual_seed(1))

    conv3x3_, _ = blocks.make_convs("2d", 1, jax.nn.silu)
    spade = blocks.MySPADE(
        norm_nc=norm_nc, label_nc=label_nc, act=jax.nn.silu,
        conv3x3=conv3x3_, spade_dim=spade_dim,
    )
    params = jax.jit(spade.init)(jax.random.PRNGKey(0), to_nhwc(x), to_nhwc(seg))
    p = params["params"]

    oracle = TorchSPADEOracle(norm_nc, label_nc, spade_dim)
    _copy_conv(oracle.mlp_shared, p["mlp_shared"])
    _copy_conv(oracle.mlp_gamma, p["mlp_gamma"])
    _copy_conv(oracle.mlp_beta, p["mlp_beta"])
    with torch.no_grad():
        ref = oracle(x, seg)

    got = jax.jit(spade.apply)(params, to_nhwc(x), to_nhwc(seg))
    np.testing.assert_allclose(to_nchw(got), ref.numpy(), rtol=5e-4, atol=5e-5)

#!/usr/bin/env python
"""Generate golden fixtures for the legacy NCSNv1/v2 RefineNet blocks from the
ACTUAL reference implementation (reference: models/better/layers.py:122-500).

Each case instantiates a reference block with seeded torch init, runs it on a
fixed input, and stores {inputs, y, output, state_dict} in one combined
tests/golden/legacy_blocks.npz (keys namespaced ``<case>::``). The committed
fixture lets tests/test_legacy_blocks.py verify weight-mapping + forward
parity without the reference present.

Reference dilation>1 ResidualBlock paths are NOT generated: ncsn_conv3x3
keeps padding=1 regardless of dilation (layers.py:97-104), so the residual
add fails on a shape mismatch — dead-broken code upstream.

The reference's ncsn_conv3x3 also crashes outright when bias=False
(``conv.bias.data *= init_scale`` on a None bias, layers.py:103), which
breaks construction of every CRP/RCU/Refine block. Since init_scale=1 makes
that multiply a no-op, we patch the guard in here to recover the intended
semantics for golden generation.
"""

import os
import sys

import numpy as np

REF = os.environ.get("MCVD_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    sys.path.insert(0, REF)
    import torch
    from models.better import layers as L
    from models.better.normalization import (
        ConditionalInstanceNorm2dPlus,
        InstanceNorm2dPlus,
    )

    import torch.nn as nn

    def ncsn_conv3x3_fixed(in_planes, out_planes, stride=1, bias=True,
                           dilation=1, init_scale=1.0, padding=1):
        conv = nn.Conv2d(in_planes, out_planes, stride=stride, bias=bias,
                         dilation=dilation, padding=padding, kernel_size=3)
        init_scale = 1e-10 if init_scale == 0 else init_scale
        conv.weight.data *= init_scale
        if conv.bias is not None:
            conv.bias.data *= init_scale
        return conv

    L.ncsn_conv3x3 = ncsn_conv3x3_fixed

    def rand(*shape, seed):
        g = torch.Generator().manual_seed(seed)
        return torch.randn(*shape, generator=g)

    cases = {}

    def add(name, mod, inputs, y=None, shape=None):
        mod.eval()
        # list inputs are passed through as lists (MSF/Refine take xs lists,
        # even with one element); bare tensors are passed directly
        args = list(inputs) if isinstance(inputs, (list, tuple)) else [inputs]
        call = args if isinstance(inputs, (list, tuple)) else inputs
        with torch.no_grad():
            if y is not None and shape is not None:
                out = mod(call, y, shape)
            elif y is not None:
                out = mod(call, y)
            elif shape is not None:
                out = mod(call, shape)
            else:
                out = mod(call)
        rec = {f"x{i}": a.numpy() for i, a in enumerate(args)}
        if y is not None:
            rec["y"] = y.numpy()
        rec["out"] = out.numpy()
        for k, v in mod.state_dict().items():
            rec[f"sd::{k}"] = v.detach().numpy()
        cases[name] = rec
        print(f"{name}: out {tuple(out.shape)}, {sum('sd::' in k for k in rec)} tensors")

    torch.manual_seed(0)
    y5 = torch.tensor([1, 4], dtype=torch.long)

    add("conv_mean_pool", L.ConvMeanPool(4, 6, 3), rand(2, 4, 8, 8, seed=1))
    add("conv_mean_pool_adjust",
        L.ConvMeanPool(4, 6, 3, adjust_padding=True), rand(2, 4, 7, 7, seed=2))
    add("mean_pool_conv", L.MeanPoolConv(4, 6, 3), rand(2, 4, 8, 8, seed=3))
    add("upsample_conv_c4", L.UpsampleConv(4, 6, 3), rand(2, 4, 5, 5, seed=4))
    # C=6 not divisible by 4: exercises the cat+PixelShuffle channel scramble
    add("upsample_conv_c6", L.UpsampleConv(6, 4, 3), rand(2, 6, 5, 5, seed=5))

    add("crp_max", L.CRPBlock(8, 2), rand(2, 8, 7, 7, seed=6))
    add("crp_avg", L.CRPBlock(8, 3, maxpool=False), rand(2, 8, 6, 6, seed=7))
    add("cond_crp",
        L.CondCRPBlock(8, 2, 5, ConditionalInstanceNorm2dPlus),
        rand(2, 8, 6, 6, seed=8), y=y5)

    add("rcu", L.RCUBlock(8, 2, 2), rand(2, 8, 6, 6, seed=9))
    add("cond_rcu",
        L.CondRCUBlock(8, 2, 2, 5, ConditionalInstanceNorm2dPlus),
        rand(2, 8, 6, 6, seed=10), y=y5)

    add("msf", L.MSFBlock([4, 8], 6),
        [rand(2, 4, 8, 8, seed=11), rand(2, 8, 4, 4, seed=12)], shape=(8, 8))
    add("cond_msf",
        L.CondMSFBlock([4, 8], 6, 5, ConditionalInstanceNorm2dPlus),
        [rand(2, 4, 8, 8, seed=13), rand(2, 8, 4, 4, seed=14)],
        y=y5, shape=(8, 8))

    add("refine2", L.RefineBlock([4, 8], 6, end=False),
        [rand(2, 4, 8, 8, seed=15), rand(2, 8, 4, 4, seed=16)], shape=(8, 8))
    # single-input start block skips MSF, so features must equal in_planes[0]
    add("refine1_end", L.RefineBlock([8], 8, start=True, end=True, maxpool=False),
        [rand(2, 8, 6, 6, seed=17)], shape=(6, 6))
    add("cond_refine2",
        L.CondRefineBlock([4, 8], 6, 5, ConditionalInstanceNorm2dPlus),
        [rand(2, 4, 8, 8, seed=18), rand(2, 8, 4, 4, seed=19)],
        y=y5, shape=(8, 8))

    add("res_plain_same",
        L.ResidualBlock(8, 8, resample=None, normalization=InstanceNorm2dPlus),
        rand(2, 8, 8, 8, seed=20))
    add("res_plain_wide",
        L.ResidualBlock(4, 8, resample=None, normalization=InstanceNorm2dPlus),
        rand(2, 4, 8, 8, seed=21))
    add("res_down",
        L.ResidualBlock(4, 8, resample="down", normalization=InstanceNorm2dPlus),
        rand(2, 4, 8, 8, seed=22))
    add("res_down_adjust",
        L.ResidualBlock(4, 8, resample="down", normalization=InstanceNorm2dPlus,
                        adjust_padding=True),
        rand(2, 4, 7, 7, seed=23))
    add("cond_res_plain_same",
        L.ConditionalResidualBlock(8, 8, 5, resample=None, dilation=1),
        rand(2, 8, 8, 8, seed=24), y=y5)
    add("cond_res_down",
        L.ConditionalResidualBlock(4, 8, 5, resample="down", dilation=1),
        rand(2, 4, 8, 8, seed=25), y=y5)

    os.makedirs(OUT, exist_ok=True)
    flat = {}
    for name, rec in cases.items():
        for k, v in rec.items():
            flat[f"{name}::{k}"] = v
    np.savez_compressed(os.path.join(OUT, "legacy_blocks.npz"), **flat)
    print(f"wrote {len(cases)} cases, {len(flat)} arrays")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate golden parity fixtures from the ACTUAL reference implementation.

Runs the reference UNetMore_DDPM / UNet (torch CPU, /root/reference) on tiny
configs with fixed inputs and saves {state_dict (numpy), input, cond, labels,
output} to tests/golden/*.npz. The committed fixtures let the test suite
verify checkpoint conversion + full forward parity WITHOUT the reference
being present. Re-run only when fixtures need regenerating.
"""

import argparse
import os
import sys

import numpy as np

REF = os.environ.get("MCVD_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_patched_ncsnpp_more():
    """Reference ncsnpp_more with the resblock_type hardcode lifted.

    The reference carries a complete 'ddpm' resblock branch
    (ncsnpp_more.py:135-156,204-249,308,366,497-511) but pins
    `self.resblock_type = resblock_type = 'biggan'` (:65, :428), making the
    branch unreachable. To generate oracle outputs for OUR config-exposed
    branch, load a copy of the module with the pin replaced by a config
    read — the only change; every other byte of the reference runs as-is."""
    import types

    import models.better.ncsnpp_more as ref_mod

    path = os.path.join(REF, "models", "better", "ncsnpp_more.py")
    src = open(path).read()
    pin = "self.resblock_type = resblock_type = 'biggan'"
    assert src.count(pin) == 2, "reference hardcode moved; re-check patch"
    patched = src.replace(
        pin,
        "self.resblock_type = resblock_type = "
        "getattr(config.model, 'resblock_type', 'biggan')")
    # SPADE_NCSNpp's ddpm branch passes cond= to the plain Downsample /
    # Upsample modules (ncsnpp_more.py:652, :696) whose forward(x) takes no
    # such argument — a TypeError in the dead code. The intent is plain
    # resampling (the concat class's ddpm branch calls them bare, :309,
    # :368); drop the argument.
    down_bug = "h = modules[m_idx](hs[-1], cond=cond)"
    up_bug = "  h = modules[m_idx](h, cond=cond)\n          m_idx += 1"
    assert patched.count(down_bug) == 1 and patched.count(up_bug) == 1
    patched = patched.replace(down_bug, "h = modules[m_idx](hs[-1])")
    patched = patched.replace(up_bug,
                              "  h = modules[m_idx](h)\n          m_idx += 1")
    mod = types.ModuleType("models.better.ncsnpp_more_patched")
    mod.__package__ = "models.better"
    mod.__file__ = ref_mod.__file__
    exec(compile(patched, path, "exec"), mod.__dict__)
    _fix_upsample_conv_2d()
    return mod


def _fix_upsample_conv_2d():
    """The ddpm branch's layerspp.Upsample(with_conv=True, fir=True) calls
    up_or_down_sampling.upsample_conv_2d, which crashes in torch as written:
    `w[..., ::-1, ::-1]` is numpy-style negative-step slicing (a leftover of
    the StyleGAN2 TF port) that torch rejects ("step must be greater than
    zero"). Monkeypatch the module-level function with the one-line
    torch.flip equivalent — the TF original's semantics — so the oracle
    runs. (Our UpDownConv2d up-path was already oracle-tested against these
    corrected semantics in tests/test_resample.py.)"""
    import types

    import models.better.up_or_down_sampling as uds

    path = os.path.join(REF, "models", "better", "up_or_down_sampling.py")
    src = open(path).read()
    broken = "w = w[..., ::-1, ::-1].permute(0, 2, 1, 3, 4)"
    assert src.count(broken) == 1, "reference broken slice moved; re-check"
    fixed = src.replace(
        broken, "w = torch.flip(w, [3, 4]).permute(0, 2, 1, 3, 4)")
    # second TF leftover in the same function: a 4-length NHWC-style stride
    # ([1,1,f,f]) that torch's conv_transpose2d rejects AND that corrupts the
    # output_padding formula (which expects stride[0] == factor)
    broken2 = "stride = [1, 1, factor, factor]"
    assert src.count(broken2) == 1, "reference broken stride moved; re-check"
    fixed = fixed.replace(broken2, "stride = [factor, factor]")
    mod = types.ModuleType("models.better.up_or_down_sampling_patched")
    mod.__package__ = "models.better"
    mod.__file__ = uds.__file__
    exec(compile(fixed, path, "exec"), mod.__dict__)
    # Conv2d.forward resolves upsample_conv_2d from its module globals at
    # call time, so rebinding the name on the REAL module is sufficient
    uds.upsample_conv_2d = mod.upsample_conv_2d


def build_config(arch="unetmore", spade=False, cond_emb=False,
                 resblock_type=None):
    import argparse as ap

    def ns(d):
        n = ap.Namespace()
        for k, v in d.items():
            setattr(n, k, ns(v) if isinstance(v, dict) else v)
        return n

    return ns(
        {
            "device": "cpu",
            "data": {
                "channels": 1, "image_size": 16, "num_frames": 2,
                "num_frames_cond": 2, "num_frames_future": 0,
                "logit_transform": False, "rescaled": True,
                "prob_mask_cond": 0.5 if cond_emb else 0.0,
            },
            "model": {
                "arch": arch, "version": "DDPM", "spade": spade, "spade_dim": 16,
                "cond_emb": cond_emb, "time_conditional": True, "dropout": 0.0,
                "sigma_dist": "linear", "sigma_begin": 0.02, "sigma_end": 0.0001,
                "num_classes": 20, "ngf": 16, "ch_mult": [1, 2],
                "num_res_blocks": 1, "attn_resolutions": [8],
                "n_head_channels": 8, "conditional": True,
                "noise_in_cond": False, "output_all_frames": False,
                "gamma": False, "ema": False, "ema_rate": 0.999,
                **({"resblock_type": resblock_type} if resblock_type else {}),
            },
        }
    )


def main():
    sys.path.insert(0, REF)
    import torch

    torch.manual_seed(0)
    os.makedirs(OUT, exist_ok=True)

    cases = [
        ("unetmore2d", dict(arch="unetmore")),
        ("unetmore2d_condemb", dict(arch="unetmore", cond_emb=True)),
        ("spade2d", dict(arch="unetmore", spade=True)),
        ("unetmore3d", dict(arch="unetmore3d")),
        ("unetmore3d_spade", dict(arch="unetmore3d", spade=True)),
        ("pseudo3d", dict(arch="unetmorepseudo3d")),
        ("pseudo3d_spade", dict(arch="unetmorepseudo3d", spade=True)),
        ("unet_legacy", dict(arch="unet")),
        # the reference's unreachable ddpm-resblock branch, unpinned via
        # load_patched_ncsnpp_more (oracle for config.model.resblock_type)
        ("unetmore2d_ddpmblock", dict(arch="unetmore", resblock_type="ddpm")),
        ("spade2d_ddpmblock",
         dict(arch="unetmore", spade=True, resblock_type="ddpm")),
    ]

    for name, kw in cases:
        config = build_config(**kw)
        if kw["arch"] == "unet":
            # legacy UNet uses fixed 32-group GroupNorm -> needs ngf >= 32
            config.model.ngf = 32
            from models.unet import UNet_DDPM

            net = UNet_DDPM(config)
        elif kw.get("resblock_type"):
            net = load_patched_ncsnpp_more().UNetMore_DDPM(config)
        else:
            from models.better.ncsnpp_more import UNetMore_DDPM

            net = UNetMore_DDPM(config)
        net.eval()

        B, sz, C = 2, 16, 1
        F = config.data.num_frames
        Fc = config.data.num_frames_cond
        g = torch.Generator().manual_seed(42)
        x = torch.randn(B, F * C, sz, sz, generator=g)
        cond = torch.randn(B, Fc * C, sz, sz, generator=g)
        y = torch.tensor([3, 11], dtype=torch.long)
        cond_mask = torch.tensor([1, 0], dtype=torch.int32)

        with torch.no_grad():
            if kw["arch"] == "unet":
                out = net(x, y, cond=cond)
            else:
                out = net(x, y, cond=cond, cond_mask=cond_mask if kw.get("cond_emb") else None)

        sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        np.savez_compressed(
            os.path.join(OUT, f"{name}.npz"),
            x=x.numpy(), cond=cond.numpy(), y=y.numpy(),
            cond_mask=cond_mask.numpy(), out=out.numpy(),
            **{f"sd::{k}": v for k, v in sd.items()},
        )
        print(f"{name}: out {tuple(out.shape)}, {len(sd)} tensors")


if __name__ == "__main__":
    main()

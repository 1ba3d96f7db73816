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


def build_config(arch="unetmore", spade=False, cond_emb=False):
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
    ]

    for name, kw in cases:
        config = build_config(**kw)
        if kw["arch"] == "unet":
            # legacy UNet uses fixed 32-group GroupNorm -> needs ngf >= 32
            config.model.ngf = 32
            from models.unet import UNet_DDPM

            net = UNet_DDPM(config)
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

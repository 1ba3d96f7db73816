#!/usr/bin/env python
"""Fabricate the eval-metric weight files this zero-egress environment lacks.

The reference downloads its metric weights at runtime: the I3D TorchScript
from Dropbox (models/fvd/fvd.py:30), pt_inception for FID (evaluation/
fid_PR.py), and torchvision's pretrained AlexNet for LPIPS
(models/eval_models.py). None of those URLs are reachable here, so this tool
writes files with the SAME schemas/architectures to $MCVD_WEIGHTS_DIR
(default /tmp/weights):

  * i3d_torchscript.pt   — full InceptionI3d(400) state dict, seeded random
                           init with non-trivial BatchNorm running stats
                           (exercises the BN-folding converter).
  * alexnet.pth          — AlexNet-features state dict, seeded random.
  * lpips_alex_lin.pth   — the reference's REAL in-repo LPIPS linear heads
                           (models/weights/v0.1/alex.pth), copied verbatim.
  * inception.pt         — a TorchScript simple-2d embedder
                           (conv -> global mean -> linear), the stand-in
                           schema eval/i3d.py accepts for FID features.

With these in place every weights-gated code path (FVD via the jit JAX I3D,
LPIPS, FID/PR) runs end-to-end. CAVEAT: metric VALUES from the random-init
backbones are not comparable to published numbers — drop the real pretrained
files at the same paths to get publication-grade FVD/FID/LPIPS. Only the
LPIPS linear heads are the true weights (they ship inside the reference
repo itself).

The I3D architecture is instantiated from the reference's own
models/fvd/pytorch_i3d.py (used as an oracle at generation time, exactly as
tests/test_i3d.py does); no reference code is copied into this repo.
"""

import argparse
import os
import shutil
import sys

import torch

REF = "/root/reference"


class _I3dScriptWrapper(torch.nn.Module):
    """The official i3d_torchscript.pt call interface
    (fvd.py:40: i3d(videos, rescale=..., resize=..., return_features=True));
    the stand-in ignores the preprocessing flags — callers here always
    preprocess on the JAX side first."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner

    def forward(self, x, rescale: bool = False, resize: bool = False,
                return_features: bool = True):
        return self.inner(x)


def make_i3d(out_path: str) -> None:
    sys.path.insert(0, os.path.join(REF, "models", "fvd"))
    from pytorch_i3d import InceptionI3d  # reference-as-oracle

    torch.manual_seed(1234)
    net = InceptionI3d(400, in_channels=3).eval()
    g = torch.Generator().manual_seed(99)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
    # a real TorchScript archive: trace the net (shape-specialized pad
    # constants are fine — the runtime FVD path only reads the state dict,
    # torch executes the graph only in tests at the traced T/H/W), then
    # script the kwargs wrapper around the traced module.
    with torch.no_grad():
        inner = torch.jit.trace(net, torch.randn(1, 3, 16, 224, 224))
    ts = torch.jit.script(_I3dScriptWrapper(inner))
    torch.jit.save(ts, out_path)
    print(f"wrote {out_path} (TorchScript, {len(ts.state_dict())} tensors)")


def make_alexnet(out_path: str) -> None:
    """AlexNet-features state dict under torchvision's key names
    (features.{0,3,6,8,10}.{weight,bias}) — what eval/lpips.py converts."""
    torch.manual_seed(4321)
    convs = {
        0: (64, 3, 11, 11),
        3: (192, 64, 5, 5),
        6: (384, 192, 3, 3),
        8: (256, 384, 3, 3),
        10: (256, 256, 3, 3),
    }
    sd = {}
    for idx, shape in convs.items():
        fan_in = shape[1] * shape[2] * shape[3]
        sd[f"features.{idx}.weight"] = torch.randn(shape) / fan_in**0.5
        sd[f"features.{idx}.bias"] = torch.zeros(shape[0])
    torch.save(sd, out_path)
    print(f"wrote {out_path} ({len(sd)} tensors)")


def copy_lpips_lin(out_path: str) -> None:
    src = os.path.join(REF, "models", "weights", "v0.1", "alex.pth")
    shutil.copyfile(src, out_path)
    print(f"copied real LPIPS lin heads {src} -> {out_path}")


def make_inception(out_path: str) -> None:
    """TorchScript simple-2d embedder: conv -> global mean -> linear."""
    torch.manual_seed(777)

    class Embedder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 64, 3, stride=2, padding=1)
            self.head = torch.nn.Linear(64, 128)

        def forward(self, x):  # (B, C, H, W) in [0,1]
            h = self.conv(x)
            h = h.mean(dim=(2, 3))
            return self.head(h)

    mod = torch.jit.script(Embedder().eval())
    torch.jit.save(mod, out_path)
    print(f"wrote {out_path} (TorchScript simple2d)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.environ.get("MCVD_WEIGHTS_DIR", "/tmp/weights"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    make_i3d(os.path.join(args.out, "i3d_torchscript.pt"))
    make_alexnet(os.path.join(args.out, "alexnet.pth"))
    copy_lpips_lin(os.path.join(args.out, "lpips_alex_lin.pth"))
    make_inception(os.path.join(args.out, "inception.pt"))


if __name__ == "__main__":
    main()

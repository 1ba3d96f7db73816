"""FVD feature extraction via the reference's TorchScript I3D.

Reference: models/fvd/fvd.py — videos (B, C, T, H, W) in [0,1], shortest side
bilinear-resized to 224, center-cropped, scaled to [-1,1], fed to the
TorchScript I3D (400-d features). The TorchScript file is an external
download in the reference too (Dropbox, fvd.py:30); pass its path via
config.eval.i3d_weights. Metric fidelity requires the identical network, so
this runs the actual TorchScript on torch-CPU as a sidecar rather than
approximating it — parity over purity (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import math
from typing import Callable

import numpy as np


def preprocess_batch(videos: np.ndarray, resolution: int = 224) -> np.ndarray:
    """(B, T, H, W, C) [0,1] -> (B, C, T, res, res) in [-1,1] (grayscale
    repeated to 3 channels as the reference does, ncsn_runner.py:1918-1923)."""
    import torch
    import torch.nn.functional as F

    B, T, H, W, C = videos.shape
    v = torch.from_numpy(np.ascontiguousarray(videos)).permute(0, 4, 1, 2, 3).float()
    if C == 1:
        v = v.repeat(1, 3, 1, 1, 1)
    scale = resolution / min(H, W)
    if H < W:
        target = (resolution, math.ceil(W * scale))
    else:
        target = (math.ceil(H * scale), resolution)
    out = []
    for b in range(B):
        x = F.interpolate(v[b], size=target, mode="bilinear", align_corners=False)
        h0 = (x.shape[-2] - resolution) // 2
        w0 = (x.shape[-1] - resolution) // 2
        out.append(x[:, :, h0 : h0 + resolution, w0 : w0 + resolution])
    x = torch.stack(out)
    return ((x - 0.5) * 2).contiguous()


def make_i3d_embedder(i3d_path: str, batch_size: int = 8) -> Callable:
    """Returns embed(videos (B,T,H,W,C) [0,1]) -> (B, 400) features."""
    import torch

    i3d = torch.jit.load(i3d_path).eval()
    kwargs = dict(rescale=False, resize=False, return_features=True)

    def embed(videos: np.ndarray) -> np.ndarray:
        feats = []
        with torch.no_grad():
            for i in range(0, len(videos), batch_size):
                x = preprocess_batch(np.asarray(videos[i : i + batch_size]))
                feats.append(i3d(x, **kwargs).cpu().numpy())
        return np.concatenate(feats)

    return embed

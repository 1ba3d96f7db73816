"""FID + kNN precision/recall (reference: evaluation/fid_PR.py).

Frechet distance and kNN P/R are pure array math implemented in numpy/jax;
the InceptionV3 feature extractor is pluggable (the reference downloads the
FID-compat Inception weights at runtime — pass a TorchScript/torch path via
config.eval.inception_weights and it runs as a torch-CPU sidecar, exactly
like FVD's I3D).
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np

from .video_gen import frechet_distance  # shared Frechet math


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Classic FID from precomputed stats (reference: fid_PR.py:53-100)."""
    from scipy.linalg import sqrtm

    diff = mu1 - mu2
    covmean, _ = sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return feats.mean(axis=0), np.cov(feats, rowvar=False)


def _cdist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    aa = np.sum(a * a, axis=1)[:, None]
    bb = np.sum(b * b, axis=1)[None, :]
    d2 = np.maximum(aa + bb - 2 * (a @ b.T), 0.0)
    return np.sqrt(d2)


def calculate_precision_recall(feat_r: np.ndarray, feat_g: np.ndarray, k: int = 3
                               ) -> Tuple[float, float]:
    """kNN manifold precision/recall (reference: fid_PR.py:250-262,
    Kynkäänniemi et al.): a generated sample is 'precise' if it lies within
    the k-NN radius of any real sample, and vice versa for recall."""
    d_rr = _cdist(feat_r, feat_r)
    d_gg = _cdist(feat_g, feat_g)
    # (k+1)-th smallest includes self-distance 0
    NNk_r = np.sort(d_rr, axis=1)[:, k]
    NNk_g = np.sort(d_gg, axis=1)[:, k]
    d_gr = _cdist(feat_g, feat_r)
    precision = float((d_gr <= NNk_r[None, :]).any(axis=1).mean())
    recall = float((d_gr.T <= NNk_g[None, :]).any(axis=1).mean())
    return precision, recall


def get_fid_pr(feat_r: np.ndarray, feat_g: np.ndarray, k: int = 3):
    """FID + P/R from feature sets (reference: get_fid_PR, fid_PR.py:282-321)."""
    mu_r, sig_r = activation_statistics(feat_r)
    mu_g, sig_g = activation_statistics(feat_g)
    fid = calculate_frechet_distance(mu_r, sig_r, mu_g, sig_g)
    precision, recall = calculate_precision_recall(feat_r, feat_g, k=k)
    return {"fid": fid, "precision": precision, "recall": recall}


def make_inception_embedder(weights_path: str, batch_size: int = 50) -> Callable:
    """images (B, H, W, C) in [0,1] -> (B, 2048) pool features via a torch
    sidecar (TorchScript or pickled module)."""
    import torch

    try:
        net = torch.jit.load(weights_path).eval()
    except Exception:
        net = torch.load(weights_path, map_location="cpu", weights_only=False).eval()

    def embed(images: np.ndarray) -> np.ndarray:
        feats = []
        with torch.no_grad():
            for i in range(0, len(images), batch_size):
                x = torch.from_numpy(
                    np.ascontiguousarray(images[i : i + batch_size])
                ).permute(0, 3, 1, 2).float()
                if x.shape[1] == 1:
                    x = x.repeat(1, 3, 1, 1)
                out = net(x)
                if isinstance(out, (list, tuple)):
                    out = out[0]
                feats.append(out.reshape(len(x), -1).cpu().numpy())
        return np.concatenate(feats)

    return embed

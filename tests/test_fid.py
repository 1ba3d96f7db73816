"""FID + kNN precision/recall math vs torch oracles (reference:
evaluation/fid_PR.py:216-262)."""

import numpy as np
import torch

from mcvd_tpu.eval.fid import (
    activation_statistics,
    calculate_frechet_distance,
    calculate_precision_recall,
    get_fid_pr,
)


def torch_pr(feat_r, feat_g, k=3):
    fr = torch.from_numpy(feat_r)
    fg = torch.from_numpy(feat_g)
    NNk_r = torch.cdist(fr, fr).kthvalue(k + 1).values
    NNk_g = torch.cdist(fg, fg).kthvalue(k + 1).values
    d_gr = torch.cdist(fg, fr)
    precision = (d_gr <= NNk_r[None, :]).any(dim=1).float().mean().item()
    recall = (d_gr.T <= NNk_g[None, :]).any(dim=1).float().mean().item()
    return precision, recall


def test_precision_recall_matches_torch():
    rng = np.random.RandomState(0)
    feat_r = rng.randn(100, 16).astype(np.float64)
    feat_g = (rng.randn(80, 16) * 1.5 + 0.5).astype(np.float64)
    p_ref, r_ref = torch_pr(feat_r, feat_g)
    p, r = calculate_precision_recall(feat_r, feat_g, k=3)
    assert abs(p - p_ref) < 1e-6 and abs(r - r_ref) < 1e-6


def test_fid_identity_is_zero():
    rng = np.random.RandomState(1)
    f = rng.randn(200, 8)
    mu, sig = activation_statistics(f)
    assert abs(calculate_frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_fid_increases_with_shift():
    rng = np.random.RandomState(2)
    f1 = rng.randn(300, 8)
    f2 = rng.randn(300, 8) + 1.0
    mu1, s1 = activation_statistics(f1)
    mu2, s2 = activation_statistics(f2)
    d = calculate_frechet_distance(mu1, s1, mu2, s2)
    assert 6.0 < d < 12.0  # ~ ||shift||^2 = 8 plus cov noise


def test_get_fid_pr_smoke():
    rng = np.random.RandomState(3)
    res = get_fid_pr(rng.randn(64, 8), rng.randn(64, 8))
    assert set(res) == {"fid", "precision", "recall"}
    assert 0 <= res["precision"] <= 1 and 0 <= res["recall"] <= 1


def test_nearest_neighbor_grid(tmp_path):
    """Memorization-check grid (reference evaluation/nearest_neighbor.py):
    planted exact copies must be found as their own nearest neighbor (via
    either orientation — the flip distance takes the min)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fid_pr import nearest_neighbor_grid

    rng = np.random.RandomState(0)
    real = rng.rand(12, 8, 8, 3).astype(np.float32)
    # gen[0] copies real[5]; gen[1] copies real[2] FLIPPED
    gen = rng.rand(3, 8, 8, 3).astype(np.float32)
    gen[0] = real[5]
    gen[1] = real[2][:, ::-1]

    def feats(x):
        return x.reshape(len(x), -1).astype(np.float64)

    out = str(tmp_path / "nn.png")
    nn = nearest_neighbor_grid(real, gen, feats(real), feats(gen),
                               feats(gen[:, :, ::-1]), k=2, n_samples=3,
                               out_path=out)
    assert nn.shape == (3, 2)
    assert nn[0, 0] == 5 and nn[1, 0] == 2
    assert os.path.isfile(out)
    from PIL import Image

    w, h = Image.open(out).size
    assert (w, h) == (8 * 3, 8 * 3)  # (k+1) cols x n rows of 8px tiles

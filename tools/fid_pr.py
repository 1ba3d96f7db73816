#!/usr/bin/env python
"""Standalone FID + precision/recall CLI between two sample sets.

TPU-native counterpart of the reference's legacy standalone scripts
(evaluation/fid_score_OLD.py, evaluation/pr.py, evaluation/nearest_neighbor.py
— same capability through one entry point): computes Inception features for
two directories (png/jpg images or .npy/.npz arrays of (N,H,W,C) in [0,1])
and prints FID and kNN precision/recall (k configurable, reference default 3).

Weights resolve like the runner: --weights, else $MCVD_WEIGHTS_DIR, else
/tmp/weights (see mcvd_tpu/eval/weights.py; tools/make_eval_weights.py can
fabricate schema-correct stand-ins in zero-egress environments).

Usage:
  python tools/fid_pr.py REAL_PATH GEN_PATH [--weights inception.pt]
         [--k 3] [--batch 50] [--no-pr]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_images(path: str) -> np.ndarray:
    """Directory of images / single .npy/.npz / single image file ->
    (N, H, W, C) float32 in [0,1]."""
    if os.path.isfile(path) and path.endswith((".npy", ".npz")):
        arr = np.load(path)
        if isinstance(arr, np.lib.npyio.NpzFile):
            arr = arr[list(arr.files)[0]]
        arr = np.asarray(arr, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr
    from PIL import Image

    files = sorted(
        f for ext in ("png", "jpg", "jpeg", "bmp")
        for f in glob.glob(os.path.join(path, f"*.{ext}"))
    )
    if not files:
        raise FileNotFoundError(f"no images or arrays at {path}")
    imgs = []
    for f in files:
        a = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        imgs.append(a)
    return np.stack(imgs)


def nearest_neighbor_grid(real: np.ndarray, gen: np.ndarray,
                          feats_real: np.ndarray, feats_gen: np.ndarray,
                          feats_gen_flip: np.ndarray, k: int,
                          n_samples: int, out_path: str) -> np.ndarray:
    """Memorization check (reference: evaluation/nearest_neighbor.py:70-113):
    for each generated sample, the k nearest TRAINING images by Inception-
    feature L2 distance — taking the min over the sample and its horizontal
    flip — dumped as a grid png, one row per sample: [sample, nn_1..nn_k].
    Returns the (n_samples, k) neighbor indices."""
    n = min(n_samples, len(gen))
    d = np.linalg.norm(feats_gen[:n, None] - feats_real[None], axis=-1)
    d_flip = np.linalg.norm(feats_gen_flip[:n, None] - feats_real[None], axis=-1)
    dist = np.minimum(d, d_flip)
    nn_idx = np.argsort(dist, axis=1)[:, :k]
    rows = []
    for i in range(n):
        rows.append(np.concatenate([gen[i]] + [real[j] for j in nn_idx[i]],
                                   axis=1))
    grid = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(np.uint8)
    from PIL import Image

    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(out_path)
    return nn_idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("real")
    ap.add_argument("gen")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--no-pr", action="store_true")
    ap.add_argument("--nn", type=int, default=0, metavar="K",
                    help="also dump a nearest-training-neighbor grid "
                         "(K neighbors per sample; memorization check, "
                         "reference evaluation/nearest_neighbor.py)")
    ap.add_argument("--nn-samples", type=int, default=10)
    ap.add_argument("--nn-out", default="nearest_neighbors.png")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env alone "
                         "does not override a preset platform plugin)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from mcvd_tpu.eval import weights as W
    from mcvd_tpu.eval.fid import (activation_statistics,
                                   calculate_frechet_distance,
                                   calculate_precision_recall)

    path = W.find_weights(args.weights, W.INCEPTION)
    if path is None:
        raise SystemExit(
            "no inception weights found (--weights / $MCVD_WEIGHTS_DIR / "
            "/tmp/weights); run tools/make_eval_weights.py for a stand-in")
    try:
        from mcvd_tpu.eval.i3d import make_jax_inception_embedder
        embed = make_jax_inception_embedder(path, batch_size=args.batch)
    except ValueError:
        from mcvd_tpu.eval.fid import make_inception_embedder
        embed = make_inception_embedder(path, batch_size=args.batch)

    real = load_images(args.real)
    gen = load_images(args.gen)
    fr = np.asarray(embed(real))
    fg = np.asarray(embed(gen))
    fid = calculate_frechet_distance(*activation_statistics(fr),
                                     *activation_statistics(fg))
    out = {"fid": round(float(fid), 4), "n_real": len(real), "n_gen": len(gen)}
    if not args.no_pr:
        p, r = calculate_precision_recall(fr, fg, k=args.k)
        out.update({"precision": round(float(p), 4),
                    "recall": round(float(r), 4), "k": args.k})
    if args.nn > 0:
        fg_flip = np.asarray(embed(gen[:, :, ::-1]))
        nearest_neighbor_grid(real, gen, fr, fg, fg_flip, k=args.nn,
                              n_samples=args.nn_samples, out_path=args.nn_out)
        out["nn_grid"] = args.nn_out
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()

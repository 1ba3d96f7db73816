#!/usr/bin/env python
"""Structured synthetic CIFAR-10 stand-in (zero-egress environment: no real
CIFAR download is possible — tools/get_datasets.md).

Renders 10 "classes" of colored geometric scenes (filled circles, squares,
triangles, stripes, checkers, rings, crosses, gradients, blobs, dots — each
class = one shape family with a class-consistent hue range over a colored
background) into the REAL cifar-10-batches-py pickle format, so an NCSNv2 /
unetmore image-diffusion run exercises the exact pickle->loader->transform
pipeline a real CIFAR download would, on data with learnable structure.

This is NOT the real CIFAR distribution; FID numbers from it are
plumbing+learnability evidence, not paper-comparable.

Usage: python tools/make_synth_cifar.py [--out /tmp/cifar_synth]
       [--per-class 500] [--test-per-class 100] [--size 32]
"""

import argparse
import os
import pickle

import numpy as np


def _coords(size):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    return y / (size - 1), x / (size - 1)


def render(cls: int, rng: np.random.RandomState, size: int = 32) -> np.ndarray:
    """One (size,size,3) uint8 image of class `cls` (0..9)."""
    y, x = _coords(size)
    # class-consistent foreground hue, random lightness; random dim background
    base_hue = np.array([
        [220, 60, 60], [60, 200, 80], [70, 90, 220], [230, 200, 60],
        [200, 70, 200], [70, 210, 210], [240, 140, 60], [150, 150, 150],
        [120, 220, 140], [180, 90, 140]], np.float32)[cls]
    fg = np.clip(base_hue * rng.uniform(0.7, 1.3) + rng.uniform(-20, 20, 3),
                 0, 255)
    bg = rng.uniform(10, 90, 3).astype(np.float32)
    img = np.broadcast_to(bg, (size, size, 3)).copy()

    cy, cx = rng.uniform(0.3, 0.7, 2)
    r = rng.uniform(0.15, 0.35)
    d2 = (y - cy) ** 2 + (x - cx) ** 2
    if cls == 0:                                   # circle
        mask = d2 < r * r
    elif cls == 1:                                 # square
        mask = (np.abs(y - cy) < r) & (np.abs(x - cx) < r)
    elif cls == 2:                                 # triangle
        mask = (y > cy - r) & (np.abs(x - cx) < (y - (cy - r)) * 0.6) & (y < cy + r)
    elif cls == 3:                                 # stripes
        k = rng.randint(3, 6)
        mask = (np.floor(x * k + rng.rand()) % 2).astype(bool)
    elif cls == 4:                                 # checkerboard
        k = rng.randint(2, 5)
        mask = ((np.floor(x * k) + np.floor(y * k)) % 2).astype(bool)
    elif cls == 5:                                 # ring
        mask = (d2 < r * r) & (d2 > (0.55 * r) ** 2)
    elif cls == 6:                                 # cross
        w = r * 0.4
        mask = (np.abs(y - cy) < w) | (np.abs(x - cx) < w)
    elif cls == 7:                                 # diagonal gradient (soft)
        g = (x + y) / 2.0
        img = bg[None, None, :] * (1 - g[..., None]) + fg[None, None, :] * g[..., None]
        mask = np.zeros((size, size), bool)
    elif cls == 8:                                 # two blobs
        cy2, cx2 = rng.uniform(0.2, 0.8, 2)
        r2 = rng.uniform(0.1, 0.2)
        mask = (d2 < r * r) | (((y - cy2) ** 2 + (x - cx2) ** 2) < r2 * r2)
    else:                                          # dot grid
        k = rng.randint(3, 5)
        yy = (y * k) % 1.0 - 0.5
        xx = (x * k) % 1.0 - 0.5
        mask = (yy ** 2 + xx ** 2) < 0.06
    img[mask] = fg
    img += rng.normal(0, 4, img.shape)             # sensor-ish noise
    return np.clip(img, 0, 255).astype(np.uint8)


def to_cifar_rows(images: np.ndarray) -> np.ndarray:
    """(N,32,32,3) uint8 -> (N,3072) CHW row-major CIFAR layout."""
    return images.transpose(0, 3, 1, 2).reshape(len(images), -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cifar_synth")
    ap.add_argument("--per-class", type=int, default=500)
    ap.add_argument("--test-per-class", type=int, default=100)
    # the cifar-10-batches-py pickle format is 32x32x3 by definition; the
    # loader hard-reshapes rows to (3,32,32), so any other size would write
    # garbled-or-crashing rows
    ap.add_argument("--size", type=int, default=32, choices=[32])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    base = os.path.join(args.out, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    def make_split(per_class):
        imgs, labels = [], []
        for cls in range(10):
            for _ in range(per_class):
                imgs.append(render(cls, rng, args.size))
                labels.append(cls)
        order = rng.permutation(len(imgs))
        return to_cifar_rows(np.stack(imgs))[order], [labels[i] for i in order]

    train_rows, train_labels = make_split(args.per_class)
    n = len(train_rows)
    per_batch = (n + 4) // 5
    for i in range(5):
        sl = slice(i * per_batch, min((i + 1) * per_batch, n))
        with open(os.path.join(base, f"data_batch_{i + 1}"), "wb") as f:
            pickle.dump({b"data": train_rows[sl],
                         b"labels": train_labels[sl]}, f)
    test_rows, test_labels = make_split(args.test_per_class)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({b"data": test_rows, b"labels": test_labels}, f)
    print(f"wrote {n} train / {len(test_rows)} test to {base}")


if __name__ == "__main__":
    main()

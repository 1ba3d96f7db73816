#!/usr/bin/env python
"""Structured synthetic UCF-101 stand-in (zero-egress environment: no real
UCF-101 download is possible — tools/get_datasets.md).

Renders 8 visually distinct "action classes" (bouncing ball, orbiting
blob, pendulum swing, pulsing disk, sliding bar, travelling wave, spinning
cross, drifting cloud) as real 320x240 .avi clips in the UCF directory
layout (<Class>/v_<Class>_gXX_cYY.avi) plus the official-format
trainlist01.txt / testlist01.txt, then converts them through the
PRODUCTION pipeline (mcvd_tpu.data.converters.ucf101_convert -> single
shard tree with len/target groups + num_train/num_test counters), so a
UCF101 training run exercises the exact avi->h5->loader->uint8-wire path a
real download would (reference: datasets/ucf101_convert.py:1-158,
datasets/ucf101.py:14-86).

This is NOT the real UCF-101 distribution; SSIM/FVD numbers from it are
plumbing+learnability evidence, not paper-comparable (BASELINE.md caveat).

Usage: python tools/make_synth_ucf101.py [--out /tmp/ucf_synth_raw]
       [--h5 /tmp/UCF101_h5] [--train-per-class 16] [--test-per-class 13]
       [--frames 40]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 240, 320

CLASSES = ["Bounce", "Orbit", "Swing", "Pulse", "Slide", "Wave", "Spin",
           "Drift"]

# per-class base hue (BGR for cv2.VideoWriter) so classes are also
# chromatically separable, like real UCF's scene statistics
CLASS_COLOR = {
    "Bounce": (60, 60, 230), "Orbit": (60, 200, 60), "Swing": (230, 120, 40),
    "Pulse": (40, 180, 230), "Slide": (200, 60, 200), "Wave": (60, 220, 220),
    "Spin": (230, 230, 230), "Drift": (160, 120, 80),
}


def _bg(rng, cls):
    """Static scene background: vertical gradient + a few fixed rectangles."""
    y = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    base = np.stack([30 + 40 * y, 35 + 35 * y, 45 + 30 * y], -1)
    bg = np.broadcast_to(base, (H, W, 3)).copy()
    for _ in range(4):
        y0, x0 = rng.randint(0, H - 40), rng.randint(0, W - 60)
        hh, ww = rng.randint(20, 60), rng.randint(30, 90)
        bg[y0:y0 + hh, x0:x0 + ww] += rng.uniform(-25, 25, 3).astype(np.float32)
    return np.clip(bg, 0, 255)


def render_frame(t, cls, scene):
    rng_bg, phase, speed, bg = scene
    img = bg.copy()
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    w = 2 * np.pi * speed * t + phase
    col = np.array(CLASS_COLOR[cls], np.float32)

    def blob(cy, cx, r, color, soft=4.0):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        a = np.clip(1.0 - (np.sqrt(d2) - r) / soft, 0, 1)[..., None]
        return img * (1 - a) + color * a

    if cls == "Bounce":
        cy = H - 40 - abs(140 * np.sin(w))  # gravity-ish bounce
        cx = W / 2 + 60 * np.sin(0.37 * w)
        img = blob(cy, cx, 22, col)
    elif cls == "Orbit":
        cy = H / 2 + 70 * np.sin(w)
        cx = W / 2 + 110 * np.cos(w)
        img = blob(cy, cx, 20, col)
        img = blob(H / 2, W / 2, 10, col * 0.6)
    elif cls == "Swing":
        ang = 1.1 * np.sin(w)
        cy, cx = 40 + 130 * np.cos(ang), W / 2 + 130 * np.sin(ang)
        img = blob(cy, cx, 18, col)
        n = 60
        ys = np.linspace(40, cy, n).round().astype(int).clip(0, H - 1)
        xs = np.linspace(W / 2, cx, n).round().astype(int).clip(0, W - 1)
        img[ys, xs] = 220
    elif cls == "Pulse":
        img = blob(H / 2, W / 2, 30 + 25 * np.sin(w), col, soft=8.0)
    elif cls == "Slide":
        cx = (40 + speed * 400 * t) % (W + 80) - 40
        bar = (np.abs(xx - cx) < 16) & (np.abs(yy - H / 2) < 70)
        img[bar] = col
    elif cls == "Wave":
        ridge = H / 2 + 50 * np.sin(2 * np.pi * (xx / 80) - w)
        a = np.clip(1 - np.abs(yy - ridge) / 10, 0, 1)[..., None]
        img = img * (1 - a) + col * a
    elif cls == "Spin":
        dy, dx = yy - H / 2, xx - W / 2
        ang = np.arctan2(dy, dx) - 0.8 * w
        arm = (np.abs(np.sin(2 * ang)) < 0.12) & (dy ** 2 + dx ** 2 < 110 ** 2)
        img[arm] = col
    else:  # Drift
        cy = (30 + speed * 120 * t) % H
        cx = (50 + speed * 250 * t) % W
        img = blob(cy, cx, 35, col, soft=18.0)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_synthetic_ucf(out_dir, train_per_class=16, test_per_class=13,
                        frames=40, classes=None, seed=0):
    """Render the avi tree + official-format split lists; returns the
    splits dir. Callable from tests with tiny counts."""
    import cv2

    classes = classes or CLASSES
    splits_dir = os.path.join(out_dir, "splits")
    os.makedirs(splits_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    train_lines, test_lines = [], []
    n = 0
    for ci, cls in enumerate(classes):
        os.makedirs(os.path.join(out_dir, cls), exist_ok=True)
        for v in range(train_per_class + test_per_class):
            is_train = v < train_per_class
            scene = (rng, rng.uniform(0, 2 * np.pi), rng.uniform(0.05, 0.12),
                     _bg(rng, cls))
            rel = f"{cls}/v_{cls}_g{v // 4 + 1:02d}_c{v % 4 + 1:02d}.avi"
            wr = cv2.VideoWriter(os.path.join(out_dir, rel),
                                 cv2.VideoWriter_fourcc(*"MJPG"), 25, (W, H))
            assert wr.isOpened(), "cv2 MJPG avi writer unavailable"
            for t in range(frames):
                wr.write(render_frame(t, cls, scene))
            wr.release()
            # official list format: train lines carry a 1-based class id,
            # test lines are bare paths (converters read split()[0])
            (train_lines if is_train else test_lines).append(
                f"{rel} {ci + 1}" if is_train else rel)
            n += 1
    with open(os.path.join(splits_dir, "trainlist01.txt"), "w") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(os.path.join(splits_dir, "testlist01.txt"), "w") as f:
        f.write("\n".join(test_lines) + "\n")
    print(f"rendered {n} avi files to {out_dir}")
    return splits_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ucf_synth_raw")
    ap.add_argument("--h5", default="/tmp/UCF101_h5")
    ap.add_argument("--train-per-class", type=int, default=16)
    ap.add_argument("--test-per-class", type=int, default=13)
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    from mcvd_tpu.data.converters import ucf101_convert

    splits_dir = write_synthetic_ucf(
        args.out, args.train_per_class, args.test_per_class, args.frames)
    n_train, n_test = ucf101_convert(args.out, splits_dir, args.h5,
                                     image_size=64)
    print(f"converted train={n_train} test={n_test} -> {args.h5}")


if __name__ == "__main__":
    main()

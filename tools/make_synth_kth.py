#!/usr/bin/env python
"""Structured synthetic KTH stand-in (zero-egress environment: no real KTH
download is possible — tools/get_datasets.md).

Renders articulated stick-figure "actions" (walking / boxing / handwaving
analogs: translating gait with swinging limbs, stationary punching,
overhead waving) as real .avi files, then converts them through the
PRODUCTION pipeline (mcvd_tpu.data.converters.kth_convert -> sharded h5 +
persons.pkl), so a KTH training run exercises the exact raw-video->h5->
loader->uint8-wire path a real KTH download would.

This is NOT the real KTH distribution; SSIM/FVD numbers from it are
plumbing+learnability evidence, not paper-comparable (BASELINE.md caveat).

Usage: python tools/make_synth_kth.py [--out /tmp/kth_sticks_raw]
       [--h5 /tmp/KTH64_h5] [--videos-per-person 6] [--frames 120]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _draw_line(img, y0, x0, y1, x1, val=255, thick=1):
    n = int(max(abs(y1 - y0), abs(x1 - x0), 1)) * 2
    ys = np.linspace(y0, y1, n)
    xs = np.linspace(x0, x1, n)
    H, W = img.shape
    for dy in range(-thick, thick + 1):
        for dx in range(-thick, thick + 1):
            yy = np.clip(np.round(ys + dy).astype(int), 0, H - 1)
            xx = np.clip(np.round(xs + dx).astype(int), 0, W - 1)
            img[yy, xx] = val


def render_figure(t, action, phase, speed, height=64, width=64):
    """One 64x64 uint8 frame of a stick figure at time t."""
    img = np.zeros((height, width), np.uint8)
    # faint static background texture (KTH has outdoor/indoor scenes)
    img[::8, :] = 24
    img[:, ::16] = 16
    cy = 34.0
    w = 2 * np.pi * speed * t + phase
    if action == "walking":
        cx = (8 + 1.4 * speed * 40 * t) % (width + 20) - 10
        leg = 0.9 * np.sin(w)
        arm = -0.7 * np.sin(w)
        bob = 1.2 * abs(np.cos(w))
    elif action == "boxing":
        cx = width / 2 + 6 * np.sin(0.1 * w)
        leg = 0.15
        arm = 1.3 * max(0.0, np.sin(w))  # jabs
        bob = 0.0
    else:  # handwaving
        cx = width / 2
        leg = 0.1
        arm = -2.2 - 0.8 * np.sin(w)  # arms overhead, waving
        bob = 0.0
    cy = cy - bob
    # head
    yy, xx = np.mgrid[0:height, 0:width]
    head = (yy - (cy - 14)) ** 2 + (xx - cx) ** 2 <= 9
    img[head] = 255
    # torso
    _draw_line(img, cy - 10, cx, cy + 2, cx)
    # legs
    _draw_line(img, cy + 2, cx, cy + 12, cx + 5 * np.sin(leg * np.pi / 2 + w * 0))
    _draw_line(img, cy + 2, cx, cy + 12, cx + 6 * leg)
    _draw_line(img, cy + 2, cx, cy + 12, cx - 6 * leg)
    # arms
    _draw_line(img, cy - 8, cx, cy - 2 + 4 * arm if action != "handwaving"
               else cy - 8 + 4 * arm, cx + 6 + 2 * arm)
    _draw_line(img, cy - 8, cx, cy - 2 - 2 * arm if action != "handwaving"
               else cy - 8 + 4 * arm, cx - 6 - 2 * arm)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/kth_sticks_raw")
    ap.add_argument("--h5", default="/tmp/KTH64_h5")
    ap.add_argument("--videos-per-person", type=int, default=6)
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    import cv2

    from mcvd_tpu.data.converters import kth_convert

    os.makedirs(args.out, exist_ok=True)
    actions = ["walking", "boxing", "handwaving"]
    rng = np.random.RandomState(0)
    n = 0
    for person in range(1, 26):
        for v in range(args.videos_per_person):
            action = actions[v % len(actions)]
            phase = rng.uniform(0, 2 * np.pi)
            speed = rng.uniform(0.06, 0.14)
            name = f"person{person:02d}_{action}_d{v // len(actions) + 1}_uncomp.avi"
            path = os.path.join(args.out, name)
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                 25, (64, 64))
            for t in range(args.frames):
                fr = render_figure(t, action, phase, speed)
                wr.write(np.repeat(fr[:, :, None], 3, axis=2))
            wr.release()
            n += 1
    print(f"rendered {n} avi files to {args.out}")
    count = kth_convert(args.out, args.h5, image_size=64)
    print(f"converted {count} videos -> {args.h5}")


if __name__ == "__main__":
    main()

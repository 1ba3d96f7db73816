#!/usr/bin/env python
"""Structured synthetic Cityscapes stand-in (zero-egress environment: no
real Cityscapes download is possible — tools/get_datasets.md).

Renders dashcam-style driving sequences — a perspective road with lane
markings scrolling toward the camera, building blocks sliding past on both
sides, and leading vehicles bobbing ahead — as the REAL
leftImg8bit_sequence PNG tree (city_seq_frame_leftImg8bit.png, 2:1 aspect
like the 2048x1024 originals), then converts through the PRODUCTION
pipeline (mcvd_tpu.data.converters.cityscapes_convert -> center-crop ->
resize -> sharded h5), so a Cityscapes training run exercises the exact
PNG-sequence->h5->loader path a real download would (reference:
datasets/cityscapes_convert.py, datasets/cityscapes.py).

This is NOT the real Cityscapes distribution; SSIM/FVD numbers from it are
plumbing+learnability evidence, not paper-comparable (BASELINE.md caveat).

Usage: python tools/make_synth_cityscapes.py [--out /tmp/city_synth_raw]
       [--h5 /tmp/Cityscapes128_h5] [--train-seqs 96] [--test-seqs 32]
       [--frames 30] [--size 256]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CITIES = ["aachen", "bochum", "cologne", "dresden", "erfurt", "hamburg",
          "jena", "krefeld", "monchengladbach", "strasbourg", "stuttgart",
          "zurich"]


def render_frame(t, scene, h, w):
    """One (h, w, 3) uint8 dashcam frame at time t."""
    rng_sky, buildings, cars, speed = scene
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    yn, xn = y / h, (x - w / 2) / (w / 2)  # xn in [-1, 1]
    horizon = 0.45
    img = np.zeros((h, w, 3), np.float32)

    # sky gradient
    sky = yn < horizon
    img[..., 0] = np.where(sky, 120 + 60 * (horizon - yn) / horizon, 0)
    img[..., 1] = np.where(sky, 150 + 50 * (horizon - yn) / horizon, 0)
    img[..., 2] = np.where(sky, 190 + 50 * (horizon - yn) / horizon, 0)

    # road: perspective trapezoid below the horizon
    depth = np.clip((yn - horizon) / (1 - horizon), 1e-3, 1)  # 0 at horizon
    road_half = 0.12 + 0.85 * depth
    on_road = (~sky) & (np.abs(xn) < road_half)
    img[on_road] = (np.float32(72) + 25 * depth[on_road])[:, None] * np.array(
        [1.0, 1.0, 1.05], np.float32)
    # scrolling dashed center line (motion toward camera)
    z = 4.0 / depth  # inverse-perspective depth coordinate
    dashes = ((z + speed * t) % 4.0) < 1.6
    center = on_road & (np.abs(xn) < 0.012 / depth.clip(0.04)) & dashes
    img[center] = (230, 225, 180)

    # sidewalks + building slabs sliding past
    side = (~sky) & (np.abs(xn) >= road_half)
    img[side] = (np.float32(95) + 20 * depth[side])[:, None]
    for b0, bh, bcol, bside in buildings:
        bz = (b0 - speed * t * 0.9) % 14.0 + 0.35  # recycles behind camera
        sx = bside * (0.10 + 0.95 / bz)  # screen x of the building's face
        bw = 0.45 / bz
        top = horizon - bh / bz
        mask = (np.abs(xn - sx) < bw) & (yn > top) & (yn < horizon + 0.6 / bz)
        img[mask] = bcol
        # windows
        wmask = mask & (((y * bz / 9).astype(int) % 2 == 0)
                        & ((x * bz / 11).astype(int) % 2 == 0))
        img[wmask] = np.asarray(bcol) * 0.55

    # leading cars ahead on the road
    for c0, lane, ccol, bob in cars:
        cz = 2.2 + 1.2 * np.sin(0.13 * t + c0) + bob
        cx = lane * 0.35 / cz * 3
        cw, ch = 0.34 / cz, 0.26 / cz
        cy = horizon + 0.42 / cz
        body = (np.abs(xn - cx) < cw) & (yn > cy - ch) & (yn < cy)
        img[body] = ccol
        roof = (np.abs(xn - cx) < cw * 0.7) & (yn > cy - 1.5 * ch) & (yn <= cy - ch)
        img[roof] = np.asarray(ccol) * 0.8
        lights = body & (yn > cy - 0.25 * ch) & (np.abs(np.abs(xn - cx) - cw * 0.7) < cw * 0.18)
        img[lights] = (255, 60, 50)

    img += rng_sky.normal(0, 2.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_scene(rng):
    buildings = [(rng.uniform(0, 14), rng.uniform(0.6, 2.4),
                  tuple(rng.uniform(90, 170, 3)), rng.choice([-1, 1]))
                 for _ in range(10)]
    cars = [(rng.uniform(0, 6.3), rng.choice([-1, 0, 1]),
             tuple(rng.uniform(40, 220, 3)), rng.uniform(0, 0.5))
            for _ in range(rng.randint(1, 4))]
    return (np.random.RandomState(rng.randint(1 << 31)), buildings, cars,
            rng.uniform(0.8, 1.6))


def write_split(out_dir, split, n_seqs, frames, seed, size):
    import cv2

    h, w = size, size * 2  # 2:1 like the 1024x2048 originals
    rng = np.random.RandomState(seed)
    seq_dir = os.path.join(out_dir, "leftImg8bit_sequence", split)
    for i in range(n_seqs):
        city = CITIES[rng.randint(len(CITIES))]
        d = os.path.join(seq_dir, city)
        os.makedirs(d, exist_ok=True)
        scene = make_scene(rng)
        for t in range(frames):
            frame = render_frame(t, scene, h, w)
            name = f"{city}_{i:06d}_{t:06d}_leftImg8bit.png"
            cv2.imwrite(os.path.join(d, name),
                        cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    return n_seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/city_synth_raw")
    ap.add_argument("--h5", default="/tmp/Cityscapes128_h5")
    ap.add_argument("--train-seqs", type=int, default=96)
    ap.add_argument("--test-seqs", type=int, default=32)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", type=int, default=256,
                    help="rendered frame height (converter resizes to h5 size)")
    ap.add_argument("--image-size", type=int, default=128,
                    help="h5 output size (cityscapes_big.yml: 128)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mcvd_tpu.data.converters import cityscapes_convert

    for split, n, seed in (("train", args.train_seqs, args.seed),
                           ("test", args.test_seqs, args.seed + 1)):
        wrote = write_split(args.out, split, n, args.frames, seed, args.size)
        print(f"rendered {wrote} {split} sequences to {args.out}")
        count = cityscapes_convert(args.out, args.h5, split=split,
                                   image_size=args.image_size)
        print(f"converted {count} {split} videos -> {args.h5}/{split}")


if __name__ == "__main__":
    main()

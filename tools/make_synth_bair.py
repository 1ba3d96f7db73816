#!/usr/bin/env python
"""Structured synthetic BAIR stand-in (zero-egress environment: no real BAIR
download is possible — tools/get_datasets.md).

Simulates a robot "push" scene — a gripper arm moving between random
waypoints over a textured table, displacing colored blocks it contacts —
rendered to 64x64 RGB and written as REAL TFRecords of tf.Example protos
(JPEG frames under '{t}/image_aux1/encoded', masked-CRC32C framing), the
exact on-disk format of the softmotion30_44k BAIR release. The clips then
run through the PRODUCTION converter (mcvd_tpu.data.converters.bair_convert
-> sharded h5), so a BAIR training run exercises the exact
TFRecord->JPEG-decode->h5->loader path a real download would (reference:
datasets/bair_convert.py, datasets/bair.py).

This is NOT the real BAIR distribution; SSIM/FVD numbers from it are
plumbing+learnability evidence, not paper-comparable (BASELINE.md caveat).

Usage: python tools/make_synth_bair.py [--out /tmp/bair_synth_raw]
       [--h5 /tmp/BAIR_h5] [--train-videos 256] [--test-videos 64]
       [--frames 30]
"""

import argparse
import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _table(rng, size=64):
    """Wood-grain table background with fixed lighting falloff."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    base = np.array([150, 110, 70], np.float32)
    grain = 12 * np.sin(x * rng.uniform(20, 40) + 3 * y)
    light = 1.0 - 0.25 * ((y - 0.4) ** 2 + (x - 0.5) ** 2)
    img = base[None, None, :] * light[:, :, None] + grain[:, :, None]
    img += rng.normal(0, 3, (size, size, 3))
    return np.clip(img, 0, 255)


def _blend(img, mask, color):
    img[mask] = 0.25 * img[mask] + 0.75 * np.asarray(color, np.float32)


def render_frame(table, arm_yx, blocks, size=64):
    """One (64,64,3) float frame: table + blocks + gripper arm."""
    img = table.copy()
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    for by, bx, half, color in blocks:
        mask = (np.abs(y - by) < half) & (np.abs(x - bx) < half)
        _blend(img, mask, color)
        # simple top-left highlight for 3D-ish look
        hl = (np.abs(y - (by - half * 0.4)) < half * 0.3) & (
            np.abs(x - (bx - half * 0.4)) < half * 0.3)
        _blend(img, hl & mask, np.minimum(np.asarray(color) + 60, 255))
    ay, ax = arm_yx
    # vertical rod from the top edge down to the wrist, then a claw
    rod = (np.abs(x - ax) < 1.6) & (y < ay - 3)
    claw = ((np.abs(x - (ax - 3.2)) < 1.2) | (np.abs(x - (ax + 3.2)) < 1.2)) & (
        np.abs(y - ay) < 3.5)
    wrist = (np.abs(x - ax) < 4.0) & (np.abs(y - (ay - 4)) < 1.5)
    _blend(img, rod | wrist, (70, 72, 80))
    _blend(img, claw, (100, 104, 116))
    return img


def simulate(rng, frames=30, size=64):
    """One trajectory: returns a list of (64,64,3) uint8 frames."""
    table = _table(rng, size)
    n_blocks = rng.randint(3, 6)
    palette = [(200, 40, 40), (40, 160, 220), (240, 200, 50),
               (60, 190, 90), (190, 70, 200), (240, 120, 40)]
    rng.shuffle(palette)
    blocks = []
    for i in range(n_blocks):
        blocks.append([rng.uniform(18, 52), rng.uniform(10, 54),
                       rng.uniform(2.5, 4.5), palette[i % len(palette)]])
    # arm: random waypoints, smooth segments (the BAIR arm moves in jerky
    # point-to-point pushes)
    pos = np.array([rng.uniform(14, 50), rng.uniform(8, 56)])
    target = np.array([rng.uniform(14, 52), rng.uniform(6, 58)])
    out = []
    for _ in range(frames):
        delta = target - pos
        dist = np.hypot(*delta)
        if dist < 2.0 or rng.rand() < 0.06:
            target = np.array([rng.uniform(14, 52), rng.uniform(6, 58)])
            delta = target - pos
            dist = np.hypot(*delta)
        step = delta / max(dist, 1e-6) * min(rng.uniform(2.0, 3.5), dist)
        pos = pos + step
        # push blocks the claw overlaps along the motion direction
        for b in blocks:
            if abs(b[0] - pos[0]) < b[2] + 3.5 and abs(b[1] - pos[1]) < b[2] + 4.0:
                b[0] = float(np.clip(b[0] + step[0], 4, size - 4))
                b[1] = float(np.clip(b[1] + step[1], 4, size - 4))
        out.append(np.clip(render_frame(table, pos, blocks, size), 0, 255)
                   .astype(np.uint8))
    return out


def write_split(out_dir, split, n_videos, frames, seed, per_record=32):
    """JPEG-encode trajectories into BAIR-layout TFRecord files."""
    from PIL import Image

    from mcvd_tpu.data.tfrecord import write_examples

    d = os.path.join(out_dir, split)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)

    def example(vid_rng):
        ex = {}
        for t, frame in enumerate(simulate(vid_rng, frames=frames)):
            buf = io.BytesIO()
            Image.fromarray(frame).save(buf, format="JPEG", quality=95)
            ex[f"{t}/image_aux1/encoded"] = [buf.getvalue()]
        return ex

    written = 0
    rec = 0
    while written < n_videos:
        n = min(per_record, n_videos - written)
        path = os.path.join(d, f"traj_{rec:05d}.tfrecords")
        write_examples(path, (example(np.random.RandomState(rng.randint(1 << 31)))
                              for _ in range(n)))
        written += n
        rec += 1
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bair_synth_raw")
    ap.add_argument("--h5", default="/tmp/BAIR_h5")
    ap.add_argument("--train-videos", type=int, default=256)
    ap.add_argument("--test-videos", type=int, default=64)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mcvd_tpu.data.converters import bair_convert

    os.makedirs(args.out, exist_ok=True)
    for split, n, seed in (("train", args.train_videos, args.seed),
                           ("test", args.test_videos, args.seed + 1)):
        wrote = write_split(args.out, split, n, args.frames, seed)
        print(f"wrote {wrote} {split} trajectories to {args.out}/{split}")
        count = bair_convert(args.out, args.h5, split=split)
        print(f"converted {count} {split} videos -> {args.h5}/{split}")


if __name__ == "__main__":
    main()

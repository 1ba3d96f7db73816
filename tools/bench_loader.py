#!/usr/bin/env python
"""Input-pipeline throughput proof for the h5 video path (SURVEY hard part
#5; VERDICT r1 weak #7): synthesizes a KTH-shaped lzf-compressed HDF5
dataset, measures DataLoader batches/s across worker counts, and compares
against the measured train-step time.

KTH64 protocol shapes: grayscale 64x64, frames_per_sample = num_frames(5) +
num_frames_cond(10) = 15, batch 32 (kth64_big).

Usage: python tools/bench_loader.py [--step-ms 79.6] [--out /tmp/kth_synth]
"""

import argparse
import os
import pickle
import shutil
import time

import numpy as np


def synthesize_kth(out_dir: str, n_videos: int = 75, frames: int = 120) -> str:
    """KTH-shaped shards: uint8 64x64 grayscale, lzf, persons.pkl split."""
    from mcvd_tpu.data.converters import KTHMaker

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    # single shard: persons.pkl holds global==within-shard indices (matching
    # the reference converter's layout assumption)
    maker = KTHMaker(out_dir, num_per_shard=100000, video=True, force=True)
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        # moving-gradient frames: compresses like natural video, not noise
        base = rng.rand(72, 72).astype(np.float32)
        vid = []
        for t in range(frames):
            o = t % 8
            frame = (base[o:o + 64, o:o + 64] * 255).astype(np.uint8)
            vid.append(frame[:, :, None])
        maker.add_data((vid, (v % 25) + 1, v % 6), dtype="uint8")
    maker.close()
    persons = {p: [] for p in range(1, 26)}
    for v in range(n_videos):
        persons[(v % 25) + 1].append(v)
    with open(os.path.join(out_dir, "persons.pkl"), "wb") as f:
        pickle.dump(persons, f)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=60.9,
                    help="measured train-step ms at batch 32 "
                         "(tools/profile_train.py, BENCH_NOTES.md)")
    ap.add_argument("--out", default="/tmp/kth_synth")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=15)
    args = ap.parse_args()

    from mcvd_tpu.data.loader import DataLoader
    from mcvd_tpu.data.video_datasets import KTHDataset

    synthesize_kth(args.out)
    print(f"# synthesized {args.out}: "
          f"{sum(os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out))/1e6:.0f} MB")

    need = 1000.0 / args.step_ms
    for workers in (0, 2, 4, 8):
        ds = KTHDataset(args.out, frames_per_sample=args.frames, train=True,
                        total_videos=-1)
        loader = DataLoader(ds, batch_size=args.batch, shuffle=True, seed=0,
                            repeat=True, num_workers=workers)
        it = iter(loader)
        next(it)  # warm
        n = 30
        t0 = time.time()
        for _ in range(n):
            next(it)
        dt = (time.time() - t0) / n
        bps = 1.0 / dt
        ok = "OK (loader >= step)" if bps >= need else "STARVED"
        print(f"num_workers={workers}: {bps:6.2f} batches/s "
              f"({bps*args.batch*args.frames:7.0f} frames/s) "
              f"vs step need {need:.2f}/s -> {ok}", flush=True)


if __name__ == "__main__":
    main()

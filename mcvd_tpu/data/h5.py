"""Sharded HDF5 video store: reader + writer (reference: datasets/h5.py).

Same on-disk format as the reference so its converted datasets drop in:
shards `shard_%04d.hdf5`, each with a `len` group (per-video frame counts),
one numbered group per video holding per-frame datasets (lzf-compressed), and
optional extra groups (`target`, `num_train`, ...). Torch-free.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import h5py
import numpy as np


def default_opener(p):
    return h5py.File(p, "r")


class HDF5Dataset:
    """Flat reader: __getitem__(i) returns the i-th top-level dataset
    (non-video mode) — video datasets use the group API via `opener` like the
    reference wrappers do."""

    def __init__(self, data_path: str, shuffle_shards: bool = False, opener=default_opener, seed: int = 29):
        self.data_path = data_path
        self.opener = opener
        if os.path.splitext(data_path)[-1] in (".hdf5", ".h5"):
            self.data_dir = os.path.dirname(data_path)
            self.shard_paths = [data_path]
        else:
            self.data_dir = data_path
            self.shard_paths = sorted(
                glob.glob(os.path.join(data_path, "*.hdf5"))
                + glob.glob(os.path.join(data_path, "*.h5"))
            )
        assert len(self.shard_paths) > 0, f"h5: no .hdf5 files in {self.data_dir}"

        self.shard_lengths = []
        for p in self.shard_paths:
            try:
                with opener(p) as f:
                    self.shard_lengths.append(len(f["len"].keys()))
            except Exception:
                self.shard_lengths.append(-1)
        self.num_per_shard = self.shard_lengths[0]
        self.total_num = sum(self.shard_lengths)
        self.num_of_shards = len(self.shard_paths)
        if shuffle_shards:
            rng = np.random.RandomState(seed)
            rng.shuffle(self.shard_paths)

    def __len__(self):
        return self.total_num

    def get_indices(self, idx):
        shard_idx = int(np.digitize(idx, np.cumsum(self.shard_lengths)))
        idx_in_shard = str(idx - sum(self.shard_lengths[:shard_idx]))
        return shard_idx, idx_in_shard

    def __getitem__(self, index):
        idx = index % self.total_num
        shard_idx, idx_in_shard = self.get_indices(idx)
        with self.opener(self.shard_paths[shard_idx]) as f:
            return f[idx_in_shard][()]


class HDF5Maker:
    """Shard writer (reference: datasets/h5.py:97-208)."""

    def __init__(self, out_path, num_per_shard=100000, max_shards=None, name=None,
                 name_fmt="shard_{:04d}.hdf5", force=False, video=False):
        self.out_path = out_path
        self.num_per_shard = num_per_shard
        self.max_shards = max_shards
        self.name = name
        self.name_fmt = name_fmt
        self.force = force
        self.video = video

        if os.path.splitext(out_path)[-1] in (".hdf5", ".h5"):
            if os.path.isfile(out_path):
                if not self.force:
                    raise ValueError(f"{out_path} already exists.")
                os.remove(out_path)
            self.out_dir = os.path.dirname(out_path)
            os.makedirs(self.out_dir, exist_ok=True)
            self.name = os.path.basename(out_path)
        else:
            self.out_dir = out_path
            if os.path.isdir(self.out_dir):
                if not self.force:
                    raise ValueError(f"{self.out_dir} already exists.")
                for f in glob.glob(os.path.join(self.out_dir, "*.hdf5")) + glob.glob(
                    os.path.join(self.out_dir, "*.h5")
                ):
                    os.remove(f)
            else:
                os.makedirs(self.out_dir)

        self.writer: Optional[h5py.File] = None
        self.shard_paths: List[str] = []
        self.shard_number = 0
        self.create_new_shard()

    def create_new_shard(self):
        if self.writer:
            self.writer.close()
        self.shard_number += 1
        if self.max_shards is not None and self.shard_number == self.max_shards + 1:
            return
        self.shard_p = os.path.join(
            self.out_dir,
            self.name_fmt.format(self.shard_number) if self.name is None else self.name,
        )
        assert not os.path.exists(self.shard_p), f"Record already exists! {self.shard_p}"
        self.shard_paths.append(self.shard_p)
        self.writer = h5py.File(self.shard_p, "w")
        if self.video:
            self.create_video_groups()
        self.count = 0

    def create_video_groups(self):
        self.writer.create_group("len")
        self.writer.create_group("videos")

    def add_video_data(self, data, dtype=None):
        self.writer["len"].create_dataset(str(self.count), data=len(data))
        self.writer.create_group(str(self.count))
        for i, frame in enumerate(data):
            self.writer[str(self.count)].create_dataset(
                str(i), data=frame, dtype=dtype, compression="lzf"
            )

    def add_data(self, data, dtype=None, return_curr_count=False):
        if self.video:
            self.add_video_data(data, dtype)
        else:
            self.writer.create_dataset(
                str(self.count), data=data, dtype=dtype, compression="lzf"
            )
        curr_count = self.count
        self.count += 1
        if self.count == self.num_per_shard:
            self.create_new_shard()
        if return_curr_count:
            return curr_count

    def close(self):
        self.writer.close()
        assert len(self.shard_paths)

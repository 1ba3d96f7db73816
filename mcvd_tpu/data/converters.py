"""Offline dataset converters: raw video datasets -> sharded HDF5.

Reference CLIs: datasets/kth_convert.py, bair_convert.py,
cityscapes_convert.py, ucf101_convert.py, kinetics600_convert.py. Same
on-disk output format (h5.HDF5Maker shards); decode via cv2; BAIR TFRecords
parsed with the pure-python reader (data/tfrecord.py — the reference needs
TensorFlow for this). Invoke via tools/convert_dataset.py.
"""

from __future__ import annotations

import glob
import io
import os
import pickle
import re
from typing import List, Optional

import numpy as np

from .h5 import HDF5Maker


def _read_video_frames(path: str, image_size: Optional[int] = None,
                       gray: bool = False) -> List[np.ndarray]:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if gray:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        else:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if image_size is not None:
            h, w = frame.shape[:2]
            if min(h, w) != image_size:
                scale = image_size / min(h, w)
                frame = cv2.resize(
                    frame, (round(w * scale), round(h * scale)),
                    interpolation=cv2.INTER_AREA,
                )
        frames.append(frame.astype(np.uint8))
    cap.release()
    return frames


class KTHMaker(HDF5Maker):
    """Shards with len / person / target groups (reference: kth_convert.py)."""

    def create_video_groups(self):
        self.writer.create_group("len")
        self.writer.create_group("person")
        self.writer.create_group("target")

    def add_video_data(self, data, dtype=None):
        frames, person, target = data
        self.writer["len"].create_dataset(str(self.count), data=len(frames))
        self.writer["person"].create_dataset(str(self.count), data=person, dtype="uint8")
        self.writer["target"].create_dataset(str(self.count), data=target, dtype="uint8")
        self.writer.create_group(str(self.count))
        for i, frame in enumerate(frames):
            self.writer[str(self.count)].create_dataset(
                str(i), data=frame, dtype=dtype, compression="lzf"
            )


KTH_CLASSES = ["boxing", "handclapping", "handwaving", "jogging", "running", "walking"]


def kth_convert(kth_dir: str, out_dir: str, image_size: int = 64,
                vids_per_shard: int = 100000, force: bool = False):
    """KTH avi tree (class dirs or flat) -> shards + persons.pkl."""
    maker = KTHMaker(out_dir, num_per_shard=vids_per_shard, force=force, video=True)
    persons = {p: [] for p in range(1, 26)}
    count = 0
    avis = sorted(glob.glob(os.path.join(kth_dir, "**", "*.avi"), recursive=True))
    assert avis, f"no .avi files under {kth_dir}"
    for path in avis:
        name = os.path.basename(path)  # personXX_class_dY_uncomp.avi
        m = re.match(r"person(\d+)_(\w+?)_", name)
        if not m:
            continue
        person = int(m.group(1))
        target = KTH_CLASSES.index(m.group(2)) if m.group(2) in KTH_CLASSES else 0
        frames = _read_video_frames(path, image_size=image_size, gray=True)
        if not frames:
            continue
        maker.add_data((frames, person, target), dtype="uint8")
        persons[person].append(count)
        count += 1
    maker.close()
    with open(os.path.join(out_dir, "persons.pkl"), "wb") as f:
        pickle.dump(persons, f)
    return count


def bair_convert(bair_dir: str, out_dir: str, split: str = "train",
                 vids_per_shard: int = 100000, force: bool = False):
    """BAIR TFRecords -> shards (reference: bair_convert.py, TF-free here)."""
    from PIL import Image

    from .tfrecord import read_examples

    out = os.path.join(out_dir, split)
    maker = HDF5Maker(out, num_per_shard=vids_per_shard, force=force, video=True)
    # set(): the patterns overlap ('*.tfrecord*' already matches '.tfrecords');
    # without dedup every real BAIR file would be ingested twice
    records = sorted(set(
        glob.glob(os.path.join(bair_dir, split, "*.tfrecord*"))
        + glob.glob(os.path.join(bair_dir, split, "*.tfrecords"))
    ))
    assert records, f"no tfrecords under {bair_dir}/{split}"
    count = 0
    for rec in records:
        for ex in read_examples(rec):
            # keys like '{t}/image_aux1/encoded' or '{t}/image_main/encoded'
            frame_keys = sorted(
                (k for k in ex if k.endswith("image_aux1/encoded")),
                key=lambda s: int(s.split("/")[0]),
            ) or sorted(
                (k for k in ex if k.endswith("image_main/encoded")),
                key=lambda s: int(s.split("/")[0]),
            )
            if not frame_keys:
                continue
            frames = []
            for k in frame_keys:
                raw = ex[k][0]
                try:  # JPEG/PNG-encoded
                    img = np.asarray(Image.open(io.BytesIO(raw)))
                except Exception:  # raw RGB bytes, 64x64x3
                    img = np.frombuffer(raw, np.uint8).reshape(64, 64, 3)
                frames.append(img)
            maker.add_data(frames, dtype="uint8")
            count += 1
    maker.close()
    return count


def cityscapes_convert(city_dir: str, out_dir: str, split: str = "train",
                       image_size: int = 128, vids_per_shard: int = 100000,
                       force: bool = False):
    """Cityscapes leftImg8bit_sequence PNG frames grouped per (city, seq)
    -> shards (reference: cityscapes_convert.py)."""
    import cv2

    seq_dir = os.path.join(city_dir, "leftImg8bit_sequence", split)
    pngs = sorted(glob.glob(os.path.join(seq_dir, "*", "*.png")))
    assert pngs, f"no frames under {seq_dir}"
    groups = {}
    for p in pngs:
        name = os.path.basename(p)  # city_seq_frame_leftImg8bit.png
        city, seq = name.split("_")[0], name.split("_")[1]
        groups.setdefault((city, seq), []).append(p)

    out = os.path.join(out_dir, split)
    maker = HDF5Maker(out, num_per_shard=vids_per_shard, force=force, video=True)
    count = 0
    for key in sorted(groups):
        frames = []
        for p in sorted(groups[key]):
            img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            h, w = img.shape[:2]
            # center crop square then resize (reference center-crops to h)
            w0 = (w - h) // 2
            img = img[:, w0 : w0 + h]
            img = cv2.resize(img, (image_size, image_size), interpolation=cv2.INTER_AREA)
            frames.append(img.astype(np.uint8))
        maker.add_data(frames, dtype="uint8")
        count += 1
    maker.close()
    return count


class UCFMaker(HDF5Maker):
    """Shards with len/target groups + num_train/num_test counters
    (reference: ucf101_convert.py; counts read by UCF101Dataset)."""

    def create_video_groups(self):
        self.writer.create_group("len")
        self.writer.create_group("target")

    def add_video_data(self, data, dtype=None):
        frames, target = data
        self.writer["len"].create_dataset(str(self.count), data=len(frames))
        self.writer["target"].create_dataset(str(self.count), data=target)
        self.writer.create_group(str(self.count))
        for i, frame in enumerate(frames):
            self.writer[str(self.count)].create_dataset(
                str(i), data=frame, dtype=dtype, compression="lzf"
            )


def kinetics600_convert(kin_dir: str, out_dir: str, split: str = "train",
                        image_size: int = 64, vids_per_shard: int = 1000,
                        force: bool = False, max_videos: Optional[int] = None):
    """Kinetics-600 mp4 tree (<split>/<class>/<video>.mp4) -> shards with
    len/target groups (reference: datasets/kinetics600_convert.py)."""
    maker = UCFMaker(os.path.join(out_dir, split), num_per_shard=vids_per_shard,
                     force=force, video=True)
    split_dir = os.path.join(kin_dir, split)
    classes = sorted(
        d for d in os.listdir(split_dir) if os.path.isdir(os.path.join(split_dir, d))
    )
    count = 0
    for cls in classes:
        for path in sorted(
            glob.glob(os.path.join(split_dir, cls, "*.mp4"))
            + glob.glob(os.path.join(split_dir, cls, "*.avi"))
        ):
            frames = _read_video_frames(path, image_size=image_size)
            if not frames:
                continue
            maker.add_data((frames, classes.index(cls)), dtype="uint8")
            count += 1
            if max_videos and count >= max_videos:
                maker.close()
                return count
    maker.close()
    return count


def ucf101_convert(ucf_dir: str, splits_dir: str, out_dir: str,
                   image_size: int = 64, vids_per_shard: int = 100000,
                   force: bool = False):
    """UCF-101 avi set + official trainlist01/testlist01 -> ONE shard tree
    with num_train/num_test (train videos first, then test)."""
    maker = UCFMaker(out_dir, num_per_shard=vids_per_shard, force=force, video=True)

    def read_list(name):
        with open(os.path.join(splits_dir, name)) as f:
            return [ln.split()[0].strip() for ln in f if ln.strip()]

    train_list = read_list("trainlist01.txt")
    test_list = read_list("testlist01.txt")
    classes = sorted({p.split("/")[0] for p in train_list + test_list})

    def add(paths):
        n = 0
        for rel in paths:
            path = os.path.join(ucf_dir, rel)
            if not os.path.isfile(path):
                continue
            target = classes.index(rel.split("/")[0])
            frames = _read_video_frames(path, image_size=image_size)
            if frames:
                maker.add_data((frames, target), dtype="uint8")
                n += 1
        return n

    n_train = add(train_list)
    n_test = add(test_list)
    maker.writer.create_dataset("num_train", data=n_train)
    maker.writer.create_dataset("num_test", data=n_test)
    maker.close()
    return n_train, n_test

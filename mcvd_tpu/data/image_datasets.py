"""Torch-free image datasets (the reference's legacy ncsnv2 image paths,
datasets/__init__.py:53-159): CIFAR-10, CelebA, FFHQ-TFRecords, and a
generic ImageFolder for ImageNet-style trees.

TPU-first adaptation: every __getitem__ returns a (1, H, W, C) float32
single-frame "video" in [0,1] plus a target, so the image experiments run
through the SAME video pipeline (num_frames=1, num_frames_cond=0 ==
unconditional image diffusion) instead of a parallel image-only stack.

LSUN is carried via the in-tree pure-python LMDB reader
(``mcvd_tpu/data/lmdb_io.py``) — the ``lmdb`` C extension the reference's
torchvision path needs is absent here, so we parse the on-disk format
directly.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def _to_video(img: np.ndarray) -> np.ndarray:
    """HWC uint8/float -> (1, H, W, C) float32 in [0,1]."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return arr.astype(np.float32)[None]


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return arr[top:top + size, left:left + size]


class _ImageBase:
    """Shared flip/rng plumbing (mirrors the video datasets' contract)."""

    def __init__(self, seed: int = 0, random_flip: bool = False):
        self._seed = seed
        self._epoch = 0
        self.random_flip = random_flip

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _rng(self, index: int):
        return np.random.default_rng(
            np.random.SeedSequence([self._seed, self._epoch, int(index)]))

    def _maybe_flip(self, video: np.ndarray, index: int) -> np.ndarray:
        if self.random_flip and self._rng(index).integers(2) == 0:
            return video[:, :, ::-1].copy()
        return video


class CIFAR10Dataset(_ImageBase):
    """Standard CIFAR-10 python pickles (cifar-10-batches-py/data_batch_*,
    test_batch) — reference: torchvision CIFAR10 at datasets/__init__.py:54-57,
    minus the download (zero egress)."""

    def __init__(self, data_path: str, train: bool = True,
                 random_flip: bool = False, seed: int = 0):
        super().__init__(seed, random_flip)
        base = os.path.join(data_path, "cifar-10-batches-py")
        if not os.path.isdir(base):
            base = data_path
        names = ([f"data_batch_{i}" for i in range(1, 6)] if train
                 else ["test_batch"])
        datas, labels = [], []
        for n in names:
            with open(os.path.join(base, n), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            datas.append(np.asarray(d[b"data"], np.uint8))
            labels.extend(d.get(b"labels", d.get(b"fine_labels", [])))
        # (N, 3072) row-major CHW -> (N, 32, 32, 3)
        self.images = np.concatenate(datas).reshape(-1, 3, 32, 32).transpose(
            0, 2, 3, 1)
        self.targets = np.asarray(labels, np.int64)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        video = self._maybe_flip(_to_video(self.images[index]), index)
        return video, int(self.targets[index])


class CelebADataset(_ImageBase):
    """torchvision CelebA layout: <root>/celeba/img_align_celeba/*.jpg +
    list_eval_partition.txt (0=train 1=valid 2=test). Reference transform:
    CenterCrop(140) -> Resize(image_size) [-> RandomHorizontalFlip]
    (datasets/__init__.py:60-84)."""

    _SPLITS = {"train": 0, "valid": 1, "test": 2}

    def __init__(self, data_path: str, split: str = "train", image_size: int = 64,
                 random_flip: bool = False, seed: int = 0):
        super().__init__(seed, random_flip)
        base = os.path.join(data_path, "celeba")
        if not os.path.isdir(base):
            base = data_path
        self.img_dir = os.path.join(base, "img_align_celeba")
        self.image_size = image_size
        want = self._SPLITS[split]
        self.files = []
        with open(os.path.join(base, "list_eval_partition.txt")) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2 and int(parts[1]) == want:
                    self.files.append(parts[0])

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index):
        from PIL import Image

        img = Image.open(os.path.join(self.img_dir, self.files[index]))
        img = img.convert("RGB")
        arr = _center_crop(np.asarray(img, np.uint8), 140)
        img = Image.fromarray(arr).resize(
            (self.image_size, self.image_size), Image.BILINEAR)
        video = self._maybe_flip(_to_video(np.asarray(img, np.uint8)), index)
        return video, 0


class FFHQTFRecordsDataset(_ImageBase):
    """StyleGAN FFHQ tfrecords (ffhq-rNN.tfrecords: per-example bytes
    feature 'data' holding raw CHW uint8 + int64 'shape') via the in-tree
    pure-python TFRecord reader — reference: datasets/ffhq_tfrecords.py
    (TF-dependent, effectively dead there; live here)."""

    def __init__(self, data_path: str, resolution: int = 256,
                 random_flip: bool = False, seed: int = 0):
        super().__init__(seed, random_flip)
        from .tfrecord import read_examples

        import glob as _glob

        paths = sorted(
            _glob.glob(os.path.join(data_path, f"*r{resolution:02d}.tfrecords"))
            or _glob.glob(os.path.join(data_path, "*.tfrecords")))
        if not paths:
            raise FileNotFoundError(f"no .tfrecords under {data_path}")
        self.images = []
        for p in paths:
            for ex in read_examples(p):
                shape = [int(s) for s in ex["shape"]]
                arr = np.frombuffer(b"".join(ex["data"]), np.uint8).reshape(shape)
                self.images.append(arr.transpose(1, 2, 0))  # CHW -> HWC

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        return self._maybe_flip(_to_video(self.images[index]), index), 0


class LSUNDataset(_ImageBase):
    """LSUN scene/object categories out of the standard LMDB environments
    (``<root>/<category>_<split>_lmdb/data.mdb``, values = encoded images),
    read with the in-tree pure-python LMDB parser. Reference: torchvision
    ``datasets.LSUN`` at datasets/__init__.py:87-114 with transform
    Resize(image_size) -> CenterCrop(image_size) [-> RandomHorizontalFlip].

    Like torchvision, the key list is enumerated once (a keys-only B+tree
    walk — values stay untouched) and cached next to the environment as
    ``_keys_cache.pkl`` so reopening a multi-million-entry category is fast.
    """

    def __init__(self, data_path: str, category: str, split: str = "train",
                 image_size: int = 64, random_flip: bool = False,
                 seed: int = 0):
        super().__init__(seed, random_flip)
        from .lmdb_io import LMDBReader

        env_dir = os.path.join(data_path, f"{category}_{split}_lmdb")
        if not os.path.isdir(env_dir) and os.path.isdir(data_path) \
                and data_path.endswith("_lmdb"):
            env_dir = data_path
        self._db = LMDBReader(env_dir)
        self.image_size = image_size
        cache = os.path.join(env_dir, "_keys_cache.pkl")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                self.keys = pickle.load(f)
        else:
            self.keys = list(self._db.keys())
            try:
                with open(cache, "wb") as f:
                    pickle.dump(self.keys, f)
            except OSError:
                pass  # read-only media: enumerate again next time

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index):
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(self._db.get(self.keys[index]))).convert("RGB")
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(self.image_size, round(w * scale)),
                          max(self.image_size, round(h * scale))),
                         Image.BILINEAR)
        arr = _center_crop(np.asarray(img, np.uint8), self.image_size)
        return self._maybe_flip(_to_video(arr), index), 0


class ImageFolderDataset(_ImageBase):
    """Generic <root>/<class>/*.{png,jpg} tree (ImageNet-style; reference:
    datasets/imagenet.py). Resize shortest side then center-crop to
    image_size (the reference's val transform; its train RandomResizedCrop
    is replaced by this deterministic crop + optional flip)."""

    EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, data_path: str, image_size: int = 64,
                 random_flip: bool = False, seed: int = 0, classes=None):
        super().__init__(seed, random_flip)
        self.image_size = image_size
        self.samples = []
        class_names = sorted(
            d for d in os.listdir(data_path)
            if os.path.isdir(os.path.join(data_path, d)))
        if classes is not None:
            keep = set(classes)
            class_names = [c for i, c in enumerate(class_names)
                           if i in keep or c in keep]
        for ci, cname in enumerate(class_names):
            cdir = os.path.join(data_path, cname)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(self.EXTS):
                    self.samples.append((os.path.join(cdir, fn), ci))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        from PIL import Image

        path, target = self.samples[index]
        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(self.image_size, round(w * scale)),
                          max(self.image_size, round(h * scale))),
                         Image.BILINEAR)
        arr = _center_crop(np.asarray(img, np.uint8), self.image_size)
        return self._maybe_flip(_to_video(arr), index), target

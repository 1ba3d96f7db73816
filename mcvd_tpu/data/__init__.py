"""Dataset registry (reference: datasets/__init__.py:20-227).

Video datasets return (T, H, W, C) float32 clips in [0,1]. The legacy
image-dataset paths of the reference (CIFAR10/CelebA/LSUN/FFHQ/ImageNet) are
served as single-frame videos through the same pipeline
(``image_datasets.py``; LSUN via the pure-python LMDB reader).
"""

from __future__ import annotations

import os

import numpy as np

from .conditioning import conditioning_fn, fold_frames, get_mode, unfold_frames
from .h5 import HDF5Dataset, HDF5Maker
from .loader import DataLoader, prefetch_to_device
from .smmnist import StochasticMovingMNIST
from .transforms import data_transform, inverse_data_transform, logit_transform
from .video_datasets import BAIRDataset, CityscapesDataset, KTHDataset, UCF101Dataset

DATASETS = [
    "CIFAR10", "CELEBA", "LSUN", "FFHQ", "IMAGENET",
    "MOVINGMNIST", "STOCHASTICMOVINGMNIST",
    "KTH", "BAIR", "CITYSCAPES", "UCF101",
]


class Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def set_epoch(self, epoch):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)


def get_dataset(data_path, config, video_frames_pred=0, start_at=0, seed=0):
    """Returns (train_dataset, test_dataset); frames_per_sample =
    num_frames_cond + num_frames_future + video_frames_pred (reference:
    datasets/__init__.py:162-211)."""
    name = config.data.dataset.upper()
    assert name in DATASETS, f"dataset must be one of {DATASETS}, got {name}"
    future = getattr(config.data, "num_frames_future", 0)
    frames_per_sample = config.data.num_frames_cond + future + video_frames_pred

    if name == "STOCHASTICMOVINGMNIST":
        dataset = StochasticMovingMNIST(
            data_path, train=True, seq_len=frames_per_sample,
            num_digits=getattr(config.data, "num_digits", 2),
            image_size=config.data.image_size,
            step_length=config.data.step_length, with_target=False, seed=seed,
        )
        test_dataset = StochasticMovingMNIST(
            data_path, train=False, seq_len=frames_per_sample,
            num_digits=getattr(config.data, "num_digits", 2),
            image_size=config.data.image_size,
            step_length=config.data.step_length, with_target=False,
            total_videos=256, seed=seed + 1,
        )
    elif name == "MOVINGMNIST":
        # deterministic variant (reference: datasets/moving_mnist.py): same
        # synthesizer with deterministic bounce
        dataset = StochasticMovingMNIST(
            data_path, train=True, seq_len=frames_per_sample,
            num_digits=getattr(config.data, "num_digits", 2),
            image_size=config.data.image_size,
            step_length=config.data.step_length, deterministic=True, seed=seed,
        )
        test_dataset = StochasticMovingMNIST(
            data_path, train=False, seq_len=frames_per_sample,
            num_digits=getattr(config.data, "num_digits", 2),
            image_size=config.data.image_size,
            step_length=config.data.step_length, deterministic=True,
            total_videos=256, seed=seed + 1,
        )
    elif name == "KTH":
        cache_mb = getattr(config.data, "cache_mb", 1024)
        dataset = KTHDataset(
            data_path, frames_per_sample=frames_per_sample, train=True,
            random_time=True, random_horizontal_flip=config.data.random_flip, seed=seed,
            cache_mb=cache_mb,
        )
        test_dataset = KTHDataset(
            data_path, frames_per_sample=frames_per_sample, train=False,
            random_time=True, random_horizontal_flip=False, total_videos=256,
            start_at=start_at, seed=seed + 1, cache_mb=cache_mb,
        )
    elif name == "BAIR":
        dataset = BAIRDataset(
            os.path.join(data_path, "train"), frames_per_sample=frames_per_sample,
            random_time=True, random_horizontal_flip=config.data.random_flip,
            color_jitter=getattr(config.data, "color_jitter", 0.0), seed=seed,
            cache_mb=getattr(config.data, "cache_mb", 1024),
        )
        test_dataset = BAIRDataset(
            os.path.join(data_path, "test"), frames_per_sample=frames_per_sample,
            random_time=True, random_horizontal_flip=False, color_jitter=0.0,
            seed=seed + 1,
        )
    elif name == "CITYSCAPES":
        dataset = CityscapesDataset(
            os.path.join(data_path, "train"), frames_per_sample=frames_per_sample,
            random_time=True, random_horizontal_flip=config.data.random_flip,
            color_jitter=getattr(config.data, "color_jitter", 0.0), seed=seed,
            cache_mb=getattr(config.data, "cache_mb", 1024),
        )
        test_dataset = CityscapesDataset(
            os.path.join(data_path, "test"), frames_per_sample=frames_per_sample,
            random_time=True, random_horizontal_flip=False, color_jitter=0.0,
            total_videos=256, seed=seed + 1,
        )
    elif name == "UCF101":
        dataset = UCF101Dataset(
            data_path, frames_per_sample=frames_per_sample,
            image_size=config.data.image_size, train=True, random_time=True,
            random_horizontal_flip=config.data.random_flip, seed=seed,
            cache_mb=getattr(config.data, "cache_mb", 1024),
        )
        test_dataset = UCF101Dataset(
            data_path, frames_per_sample=frames_per_sample,
            image_size=config.data.image_size, train=False, random_time=True,
            random_horizontal_flip=False, total_videos=256, seed=seed + 1,
        )
    elif name == "CIFAR10":
        from .image_datasets import CIFAR10Dataset

        dataset = CIFAR10Dataset(data_path, train=True,
                                 random_flip=config.data.random_flip, seed=seed)
        test_dataset = CIFAR10Dataset(data_path, train=False, seed=seed + 1)
    elif name == "CELEBA":
        from .image_datasets import CelebADataset

        dataset = CelebADataset(data_path, split="train",
                                image_size=config.data.image_size,
                                random_flip=config.data.random_flip, seed=seed)
        test_dataset = CelebADataset(data_path, split="test",
                                     image_size=config.data.image_size,
                                     seed=seed + 1)
    elif name == "FFHQ":
        from .image_datasets import FFHQTFRecordsDataset

        full = FFHQTFRecordsDataset(data_path,
                                    resolution=config.data.image_size,
                                    random_flip=config.data.random_flip,
                                    seed=seed)
        # reference's deterministic 90/10 split (seed 2019 shuffle,
        # datasets/__init__.py:133-141)
        idx = np.arange(len(full))
        np.random.default_rng(2019).shuffle(idx)
        cut = int(len(full) * 0.9)
        dataset = Subset(full, [int(i) for i in idx[:cut]])
        test_dataset = Subset(full, [int(i) for i in idx[cut:]])
    elif name == "IMAGENET":
        from .image_datasets import ImageFolderDataset

        classes = getattr(config.data, "classes", None)
        dataset = ImageFolderDataset(
            os.path.join(data_path, "train"),
            image_size=config.data.image_size,
            random_flip=config.data.random_flip, seed=seed, classes=classes)
        test_dataset = ImageFolderDataset(
            os.path.join(data_path, "val"),
            image_size=config.data.image_size, seed=seed + 1, classes=classes)
    elif name == "LSUN":
        from .image_datasets import LSUNDataset

        category = config.data.category
        dataset = LSUNDataset(data_path, category, split="train",
                              image_size=config.data.image_size,
                              random_flip=config.data.random_flip, seed=seed)
        test_dataset = LSUNDataset(data_path, category, split="val",
                                   image_size=config.data.image_size,
                                   seed=seed + 1)
    else:
        raise NotImplementedError(
            f"unknown dataset {name}; video: "
            "StochasticMovingMNIST/MovingMNIST/KTH/BAIR/Cityscapes/UCF101, "
            "image (single-frame video pipeline): CIFAR10/CelebA/FFHQ/ImageNet"
        )

    # clamp to the actual split size: a too-large subset would otherwise
    # crash mid-epoch in the loader thread (IndexError), not at build time
    subset_num = getattr(config.data, "subset", -1)
    if subset_num > 0:
        dataset = Subset(dataset, list(range(min(subset_num, len(dataset)))))
    test_subset_num = getattr(config.data, "test_subset", -1)
    if test_subset_num > 0:
        test_dataset = Subset(
            test_dataset, list(range(min(test_subset_num, len(test_dataset)))))
    return dataset, test_dataset


__all__ = [
    "DATASETS", "get_dataset", "Subset",
    "conditioning_fn", "get_mode", "fold_frames", "unfold_frames",
    "data_transform", "inverse_data_transform", "logit_transform",
    "HDF5Dataset", "HDF5Maker", "DataLoader", "prefetch_to_device",
    "StochasticMovingMNIST", "KTHDataset", "BAIRDataset",
    "CityscapesDataset", "UCF101Dataset",
]

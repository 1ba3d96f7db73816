"""Legacy image-dataset paths as single-frame videos (reference:
datasets/__init__.py:53-159 CIFAR10/CelebA/FFHQ/ImageNet) — torch-free
loaders over synthetic on-disk fixtures in each dataset's standard format,
plus an end-to-end registry check through get_dataset (T=1 unconditional
video pipeline)."""

import os
import pickle
import struct

import numpy as np

from mcvd_tpu.config import dict2namespace
from mcvd_tpu.data import get_dataset
from mcvd_tpu.data.image_datasets import (
    CIFAR10Dataset,
    CelebADataset,
    FFHQTFRecordsDataset,
    ImageFolderDataset,
)


def write_cifar10(root):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": rng.randint(0, 255, (4, 3072), np.uint8),
                         b"labels": [i % 10] * 4}, f)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({b"data": rng.randint(0, 255, (6, 3072), np.uint8),
                     b"labels": [1] * 6}, f)


def test_cifar10(tmp_path):
    write_cifar10(str(tmp_path))
    ds = CIFAR10Dataset(str(tmp_path), train=True)
    assert len(ds) == 20
    video, target = ds[3]
    assert video.shape == (1, 32, 32, 3) and video.dtype == np.float32
    assert 0.0 <= video.min() and video.max() <= 1.0
    ds_test = CIFAR10Dataset(str(tmp_path), train=False)
    assert len(ds_test) == 6 and ds_test[0][1] == 1
    # CHW row-major unpack matches the format spec: red plane first
    raw = pickle.load(open(tmp_path / "cifar-10-batches-py" / "data_batch_1",
                           "rb"), encoding="bytes")[b"data"][0]
    np.testing.assert_allclose(ds[0][0][0, 0, 0, 0], raw[0] / 255.0)


def write_celeba(root, n=6, img_size=(178, 218)):
    from PIL import Image

    base = os.path.join(root, "celeba")
    os.makedirs(os.path.join(base, "img_align_celeba"), exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.randint(0, 255, (img_size[1], img_size[0], 3),
                                    np.uint8)).save(
            os.path.join(base, "img_align_celeba", name))
        lines.append(f"{name} {0 if i < 4 else 2}")
    with open(os.path.join(base, "list_eval_partition.txt"), "w") as f:
        f.write("\n".join(lines))


def test_celeba(tmp_path):
    write_celeba(str(tmp_path))
    ds = CelebADataset(str(tmp_path), split="train", image_size=64)
    assert len(ds) == 4
    video, _ = ds[0]
    assert video.shape == (1, 64, 64, 3)
    assert len(CelebADataset(str(tmp_path), split="test", image_size=64)) == 2


def write_ffhq_tfrecords(path, n=5, res=32):
    """StyleGAN-style records via the tf.Example encoder from
    test_converters."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_converters import encode_example

    rng = np.random.RandomState(0)
    with open(path, "wb") as f:
        for _ in range(n):
            img = rng.randint(0, 255, (3, res, res), np.uint8)
            payload = encode_example({"shape": [3, res, res],
                                      "data": [img.tobytes()]})
            f.write(struct.pack("<Q", len(payload)) + b"\0\0\0\0"
                    + payload + b"\0\0\0\0")


def test_ffhq_tfrecords(tmp_path):
    write_ffhq_tfrecords(str(tmp_path / "ffhq-r32.tfrecords"), n=5, res=32)
    ds = FFHQTFRecordsDataset(str(tmp_path), resolution=32)
    assert len(ds) == 5
    video, _ = ds[2]
    assert video.shape == (1, 32, 32, 3)


def test_image_folder(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    for ci, cname in enumerate(("catfish", "dogwood")):
        os.makedirs(tmp_path / "train" / cname)
        for i in range(3):
            Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(
                tmp_path / "train" / cname / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path / "train"), image_size=32)
    assert len(ds) == 6
    video, target = ds[5]
    assert video.shape == (1, 32, 32, 3) and target == 1


def test_registry_cifar10_single_frame_pipeline(tmp_path):
    write_cifar10(str(tmp_path))
    config = dict2namespace({"data": {
        "dataset": "CIFAR10", "image_size": 32, "channels": 3,
        "num_frames": 1, "num_frames_cond": 0, "num_frames_future": 0,
        "random_flip": True, "subset": 8, "test_subset": 4,
    }})
    train_ds, test_ds = get_dataset(str(tmp_path), config,
                                    video_frames_pred=1)
    assert len(train_ds) == 8 and len(test_ds) == 4
    video, target = train_ds[0]
    assert video.shape == (1, 32, 32, 3)


def test_lmdb_roundtrip(tmp_path):
    """Pure-python LMDB writer -> reader across node kinds: inline values,
    BIGDATA overflow values, multi-level branch pages, empty env."""
    from mcvd_tpu.data.lmdb_io import LMDBReader, write_lmdb

    rng = np.random.RandomState(0)
    items = [(f"k{i:06d}".encode(),
              rng.randint(0, 255, rng.choice([8, 300, 6000]), np.uint8)
              .tobytes())
             for i in range(800)]
    items += [(b"empty-value", b""), (b"k" * 180, b"long-key")]
    write_lmdb(str(tmp_path / "env"), items)
    with LMDBReader(str(tmp_path / "env")) as r:
        assert len(r) == len(items)
        assert dict(r.items()) == dict(items)
        assert list(r.keys()) == sorted(k for k, _ in items)
        assert r.get(b"k000421") == dict(items)[b"k000421"]
        assert r.get(b"absent") is None
    write_lmdb(str(tmp_path / "empty"), [])
    with LMDBReader(str(tmp_path / "empty")) as r:
        assert len(r) == 0 and list(r.items()) == []


def write_lsun(root, category="church_outdoor", split="train", n=6):
    from io import BytesIO

    from PIL import Image

    from mcvd_tpu.data.lmdb_io import write_lmdb

    rng = np.random.RandomState(0)
    items = []
    for i in range(n):
        buf = BytesIO()
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            buf, format="WEBP" if i % 2 else "PNG")
        items.append((f"{i:08x}".encode(), buf.getvalue()))
    write_lmdb(os.path.join(root, f"{category}_{split}_lmdb"), items)


def test_lsun(tmp_path):
    from mcvd_tpu.data.image_datasets import LSUNDataset

    write_lsun(str(tmp_path), n=6)
    ds = LSUNDataset(str(tmp_path), "church_outdoor", split="train",
                     image_size=32)
    assert len(ds) == 6
    video, _ = ds[1]
    assert video.shape == (1, 32, 32, 3) and video.dtype == np.float32
    # key cache speeds up reopen and yields the identical dataset
    assert os.path.exists(tmp_path / "church_outdoor_train_lmdb"
                          / "_keys_cache.pkl")
    ds2 = LSUNDataset(str(tmp_path), "church_outdoor", split="train",
                      image_size=32)
    np.testing.assert_array_equal(ds2[1][0], video)


def test_registry_lsun(tmp_path):
    write_lsun(str(tmp_path), split="train", n=5)
    write_lsun(str(tmp_path), split="val", n=3)
    config = dict2namespace({"data": {
        "dataset": "LSUN", "category": "church_outdoor", "image_size": 32,
        "channels": 3, "num_frames": 1, "num_frames_cond": 0,
        "num_frames_future": 0, "random_flip": True,
    }})
    train_ds, test_ds = get_dataset(str(tmp_path), config,
                                    video_frames_pred=1)
    assert len(train_ds) == 5 and len(test_ds) == 3
    assert train_ds[2][0].shape == (1, 32, 32, 3)


def test_synth_cifar_tool_roundtrip(tmp_path):
    """tools/make_synth_cifar.py writes the real pickle format the loader
    reads; classes render distinct structured images."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [_sys.executable, os.path.join(repo, "tools", "make_synth_cifar.py"),
         "--out", str(tmp_path), "--per-class", "3", "--test-per-class", "2"],
        check=True, capture_output=True)
    ds = CIFAR10Dataset(str(tmp_path), train=True)
    assert len(ds) == 30
    v, t = ds[0]
    assert v.shape == (1, 32, 32, 3) and v.dtype == np.float32
    assert 0 <= int(t) <= 9
    # structured, not constant: some spatial variance in every image
    stds = [ds[i][0].std() for i in range(10)]
    assert all(s > 0.01 for s in stds)
    ds_test = CIFAR10Dataset(str(tmp_path), train=False)
    assert len(ds_test) == 20

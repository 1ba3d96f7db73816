"""Converter roundtrips: synthetic raw data -> HDF5 shards -> dataset classes.
Also a pure-python TFRecord/tf.Example parse roundtrip."""

import os
import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mcvd_tpu.data.converters import kth_convert, ucf101_convert
from mcvd_tpu.data.tfrecord import parse_example, read_examples
from mcvd_tpu.data.video_datasets import KTHDataset, UCF101Dataset


def write_avi(path, n_frames=12, size=64, width=None, seed=0):
    rng = np.random.RandomState(seed)
    width = width or size
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    w = cv2.VideoWriter(path, fourcc, 25, (width, size))
    for t in range(n_frames):
        frame = rng.randint(0, 255, (size, width, 3), np.uint8)
        w.write(frame)
    w.release()


def test_kth_convert_roundtrip(tmp_path):
    raw = tmp_path / "kth_raw"
    raw.mkdir()
    for person in (1, 2, 21):
        for cls in ("boxing", "walking"):
            write_avi(str(raw / f"person{person:02d}_{cls}_d1_uncomp.avi"),
                      seed=person)
    out = tmp_path / "KTH64_h5"
    n = kth_convert(str(raw), str(out), image_size=64)
    assert n == 6
    ds = KTHDataset(str(out), frames_per_sample=4, train=True)
    video, target = ds[0]
    assert video.shape == (4, 64, 64, 1)
    assert 0.0 <= video.min() and video.max() <= 1.0
    ds_test = KTHDataset(str(out), frames_per_sample=4, train=False)
    assert len(ds_test) == 2  # person 21 x 2 classes


def test_kth_windowed_read_matches_cached(tmp_path):
    """cache_mb=0 uses a windowed h5 read (only the sampled frames are
    decoded) and must produce byte-identical samples to the cached
    whole-video path — the rng consumption order (flip, then window) is the
    reproducibility contract (ADVICE r2: the no-cache path must not decode
    the entire video)."""
    raw = tmp_path / "kth_raw"
    raw.mkdir()
    for person in (1, 2):
        write_avi(str(raw / f"person{person:02d}_boxing_d1_uncomp.avi"),
                  n_frames=20, seed=person)
    out = tmp_path / "KTH64_h5"
    kth_convert(str(raw), str(out), image_size=64)
    kw = dict(frames_per_sample=4, train=True, random_time=True,
              random_horizontal_flip=True, seed=3)
    cached = KTHDataset(str(out), cache_mb=64, **kw)
    windowed = KTHDataset(str(out), cache_mb=0, **kw)
    for i in range(len(cached)):
        vc, tc = cached[i]
        vw, tw = windowed[i]
        assert tc == tw
        np.testing.assert_array_equal(vc, vw)


def test_ucf101_convert_roundtrip(tmp_path):
    raw = tmp_path / "ucf_raw"
    (raw / "ApplyEyeMakeup").mkdir(parents=True)
    (raw / "Archery").mkdir()
    splits = tmp_path / "splits"
    splits.mkdir()
    train, test = [], []
    for i in range(3):
        rel = f"ApplyEyeMakeup/v_ApplyEyeMakeup_g{i:02d}_c01.avi"
        write_avi(str(raw / rel), size=240, width=320, seed=i)
        train.append(rel)
    for i in range(2):
        rel = f"Archery/v_Archery_g{i:02d}_c01.avi"
        write_avi(str(raw / rel), size=240, width=320, seed=10 + i)
        test.append(rel)
    (splits / "trainlist01.txt").write_text("\n".join(f"{r} 1" for r in train))
    (splits / "testlist01.txt").write_text("\n".join(test))

    out = tmp_path / "UCF_h5"
    n_train, n_test = ucf101_convert(str(raw), str(splits), str(out), image_size=64)
    assert (n_train, n_test) == (3, 2)
    ds = UCF101Dataset(str(out), frames_per_sample=4, image_size=64, train=True)
    video, target = ds[0]
    assert video.shape == (4, 64, 64, 3)


def encode_example(features):
    """Minimal tf.Example encoder (test-side oracle for the parser)."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wire, payload):
        return varint((num << 3) | wire) + payload

    def ld(num, payload):
        return field(num, 2, varint(len(payload)) + payload)

    entries = b""
    for key, val in features.items():
        if isinstance(val[0], bytes):
            lst = b"".join(ld(1, v) for v in val)
            feat = ld(1, lst)
        elif isinstance(val[0], float):
            packed = struct.pack(f"<{len(val)}f", *val)
            feat = ld(2, ld(1, packed))
        else:
            packed = b"".join(varint(v) for v in val)
            feat = ld(3, ld(1, packed))
        entry = ld(1, key.encode()) + ld(2, feat)
        entries += ld(1, entry)
    return ld(1, entries)


def test_tf_example_parser():
    feats = {
        "0/image_aux1/encoded": [b"\x01\x02\x03"],
        "scores": [1.5, -2.25],
        "ids": [3, 700],
    }
    buf = encode_example(feats)
    parsed = parse_example(buf)
    assert parsed["0/image_aux1/encoded"] == [b"\x01\x02\x03"]
    np.testing.assert_allclose(parsed["scores"], [1.5, -2.25])
    assert parsed["ids"] == [3, 700]


def test_tfrecord_framing(tmp_path):
    path = tmp_path / "x.tfrecord"
    payloads = [encode_example({"a": [1]}), encode_example({"b": [2.0]})]
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\0\0\0\0" + p + b"\0\0\0\0")
    exs = list(read_examples(str(path)))
    assert exs[0]["a"] == [1]
    np.testing.assert_allclose(exs[1]["b"], [2.0])


def test_kinetics600_convert_roundtrip(tmp_path):
    from mcvd_tpu.data.converters import kinetics600_convert
    from mcvd_tpu.data.h5 import HDF5Dataset

    raw = tmp_path / "kin" / "train"
    (raw / "dancing").mkdir(parents=True)
    (raw / "surfing").mkdir()
    write_avi(str(raw / "dancing" / "a.avi"), size=128, width=160, seed=0)
    write_avi(str(raw / "surfing" / "b.avi"), size=128, width=160, seed=1)
    out = tmp_path / "KIN_h5"
    n = kinetics600_convert(str(tmp_path / "kin"), str(out), split="train",
                            image_size=64)
    assert n == 2
    ds = HDF5Dataset(str(out / "train"))
    assert len(ds) == 2
    with ds.opener(ds.shard_paths[0]) as f:
        assert int(f["len"]["0"][()]) == 12
        assert int(f["target"]["1"][()]) == 1


def test_tfrecord_writer_crc_and_roundtrip(tmp_path):
    """Writer emits verified masked-CRC32C framing (known CRC-32C vector)
    and records the production reader parses back exactly."""
    from mcvd_tpu.data.tfrecord import _crc32c, _masked_crc, write_examples

    assert _crc32c(b"123456789") == 0xE3069283  # canonical check vector
    # masked crc of the check vector: HARD-CODED literal (derived once from
    # the RFC 3720 crc + TF's rot-right-15 + 0xA282EAD8 masking), so a wrong
    # rotation direction or mask constant fails here instead of silently
    # producing files a real TensorFlow reader rejects (ADVICE r4)
    assert _masked_crc(b"123456789") == 0xC78AB0E5

    path = str(tmp_path / "w.tfrecords")
    examples = [
        {"0/image_aux1/encoded": [b"\xff\xd8jpeg-ish"], "ids": [7, 300]},
        # negative int64 (10-byte two's-complement varint) and numpy floats
        # (must route to FloatList, not be int()-truncated) both roundtrip
        {"scores": [0.5, -1.25], "signed": [-1, -42, 5],
         "np_scores": list(np.asarray([0.25, -3.5], np.float32))},
    ]
    write_examples(path, examples)
    # verify_crc=True makes the roundtrip exercise BOTH masked-CRC fields
    # of every record, so writer and reader cannot share a hidden bug
    back = list(read_examples(path, verify_crc=True))
    assert back[0]["0/image_aux1/encoded"] == [b"\xff\xd8jpeg-ish"]
    assert back[0]["ids"] == [7, 300]
    np.testing.assert_allclose(back[1]["scores"], [0.5, -1.25])
    assert back[1]["signed"] == [-1, -42, 5]
    np.testing.assert_allclose(back[1]["np_scores"], [0.25, -3.5])


def test_tfrecord_crc_verification_catches_corruption(tmp_path):
    from mcvd_tpu.data.tfrecord import read_tfrecord, write_examples

    path = str(tmp_path / "c.tfrecords")
    write_examples(path, [{"ids": [1, 2, 3]}])
    data = bytearray(open(path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    assert len(list(read_tfrecord(path))) == 1  # unverified read: accepted
    with pytest.raises(ValueError, match="payload-crc mismatch"):
        list(read_tfrecord(path, verify_crc=True))


def test_encode_example_type_dispatch(tmp_path):
    """Whole-list type dispatch (ADVICE r4): int-led mixed lists promote to
    FloatList; empty and bytes-mixed lists are rejected."""
    from mcvd_tpu.data.tfrecord import encode_example, parse_example

    # [int, float] must NOT truncate 2.5 via Int64List
    mixed = parse_example(encode_example({"m": [1, 2.5]}))
    np.testing.assert_allclose(mixed["m"], [1.0, 2.5])
    with pytest.raises(ValueError, match="empty list"):
        encode_example({"e": []})
    with pytest.raises(ValueError, match="mixes bytes"):
        encode_example({"b": [b"x", 1]})
    with pytest.raises(ValueError, match="unsupported element types"):
        encode_example({"s": ["a string"]})


def test_synth_bair_convert_roundtrip(tmp_path):
    """make_synth_bair writes real BAIR-layout TFRecords (JPEG frames under
    {t}/image_aux1/encoded) that the production bair_convert ingests."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synth_bair import write_split

    from mcvd_tpu.data.converters import bair_convert
    from mcvd_tpu.data.h5 import HDF5Dataset

    wrote = write_split(str(tmp_path / "raw"), "train", n_videos=3, frames=6,
                        seed=0, per_record=2)
    assert wrote == 3
    n = bair_convert(str(tmp_path / "raw"), str(tmp_path / "h5"), split="train")
    assert n == 3
    ds = HDF5Dataset(str(tmp_path / "h5" / "train"))
    assert len(ds) == 3
    with ds.opener(ds.shard_paths[0]) as f:
        assert int(f["len"]["0"][()]) == 6
        frame = f["0"]["3"][()]
        assert frame.shape == (64, 64, 3) and frame.dtype == np.uint8


def test_synth_ucf101_convert_roundtrip(tmp_path):
    """make_synth_ucf101 writes a real UCF-layout avi tree + official split
    lists that the production ucf101_convert ingests into the single shard
    tree UCF101Dataset expects (len/target groups + num_train/num_test)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_synth_ucf101 import write_synthetic_ucf

    from mcvd_tpu.data.converters import ucf101_convert
    from mcvd_tpu.data.video_datasets import UCF101Dataset

    splits = write_synthetic_ucf(str(tmp_path / "raw"), train_per_class=2,
                                 test_per_class=10, frames=10,
                                 classes=["Bounce", "Spin"])
    n_train, n_test = ucf101_convert(str(tmp_path / "raw"), splits,
                                     str(tmp_path / "h5"), image_size=64)
    assert (n_train, n_test) == (4, 20)
    ds = UCF101Dataset(str(tmp_path / "h5"), frames_per_sample=4, train=True,
                       image_size=64, seed=0)
    v, target = ds[1]
    assert v.shape == (4, 64, 64, 3) and v.dtype == np.float32
    assert 0.0 <= v.min() and v.max() <= 1.0 and target in (0, 1)
    ds_test = UCF101Dataset(str(tmp_path / "h5"), frames_per_sample=4,
                            train=False, image_size=64, seed=1)
    assert len(ds_test) == 2  # every 10th test video after the train block
    v, _ = ds_test[0]
    assert v.shape == (4, 64, 64, 3)

"""Native (C++) host data-path, JIT-built at first use via g++ (the host-side
analog of the reference's import-time CUDA JIT, models/better/op/upfirdn2d.py:21-27).
ctypes bindings — no pybind11 in this image."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libmcvd_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    src = os.path.join(_HERE, "smmnist.cpp")
    if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
                 "-o", _LIB_PATH],
                check=True, capture_output=True,
            )
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.smmnist_synthesize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_uint64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.smmnist_synthesize.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def smmnist_synthesize_batch(digits: np.ndarray, indices: np.ndarray, *,
                             seed: int, epoch: int, seq_len: int,
                             image_size: int, num_digits: int,
                             deterministic: bool) -> Optional[np.ndarray]:
    """Returns (B, T, sz, sz, 1) float32 videos, or None if the native lib is
    unavailable (caller falls back to the numpy synthesizer)."""
    lib = get_lib()
    if lib is None:
        return None
    digits = np.ascontiguousarray(digits, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    B = len(indices)
    out = np.empty((B, seq_len, image_size, image_size), np.float32)
    lib.smmnist_synthesize(
        digits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(digits)), ctypes.c_int32(digits.shape[1]),
        ctypes.c_uint64(seed), ctypes.c_int64(epoch),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(B), ctypes.c_int32(seq_len), ctypes.c_int32(image_size),
        ctypes.c_int32(num_digits), ctypes.c_int32(int(deterministic)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[..., None]

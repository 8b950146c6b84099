"""Native (C++) host components with transparent numpy fallbacks.

Compiled on first import with the system g++ into a cached shared library;
if no toolchain is available everything still works through the numpy
implementations (same signatures, same results — tested against each other).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "rle.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_rle.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return _lib
    lib.rle_encode.restype = ctypes.c_int
    _lib = lib
    return _lib


def rle_encode(mask: np.ndarray) -> dict:
    """Binary (H, W) mask -> COCO uncompressed RLE dict."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = _load()
    if lib:
        counts = np.zeros(h * w + 1, dtype=np.uint32)
        n = lib.rle_encode(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        runs = counts[:n].tolist()
    else:  # numpy fallback
        flat = mask.T.reshape(-1)
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        runs = np.diff(bounds).tolist()
        if flat[0] != 0:
            runs = [0] + runs
    return {"size": [h, w], "counts": runs}


def rle_decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], dtype=np.uint32)
    lib = _load()
    if lib:
        mask = np.zeros((h, w), dtype=np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts), h, w,
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return mask
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts.tolist():
        flat[pos : pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape(w, h).T


def confusion_update_host(conf: np.ndarray, pred: np.ndarray, gt: np.ndarray, ignore: int) -> np.ndarray:
    """Host confusion-matrix accumulation (fallback to the on-device path)."""
    K = conf.shape[0] - 1
    pred = np.ascontiguousarray(pred.astype(np.int32)).reshape(-1)
    gt = np.ascontiguousarray(gt.astype(np.int32)).reshape(-1)
    lib = _load()
    if lib:
        lib.confusion_update(
            pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(pred.size), K, ctypes.c_int64(ignore),
            conf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return conf
    g = gt.astype(np.int64).copy()
    g[(g == ignore) | (g < 0) | (g > K)] = K
    p = np.clip(pred.astype(np.int64), 0, K)
    np.add.at(conf, (p, g), 1)
    return conf


def available() -> bool:
    return bool(_load())

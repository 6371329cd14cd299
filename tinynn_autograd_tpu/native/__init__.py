"""ctypes bindings for the native host-side data pipeline.

Compiles ``data_loader.cpp`` with g++ on first import (cached next to the
source); every entry point has a numpy fallback so the framework works
without a toolchain. See data_loader.cpp for what runs natively.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "data_loader.cpp")
_SO = os.path.join(_DIR, "libtinynn_data.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.gather_rows_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64]
            lib.one_hot_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64]
            lib.shuffle_indices.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    return _load() is not None


def gather_rows(src, idx):
    """src[idx] for a C-contiguous float32 2-D array; numpy fallback
    otherwise. Indices are bounds-checked up front so the native path can
    never read out of range (numpy would raise; the raw C loop would not)."""
    lib = _load()
    if (lib is None or src.ndim != 2 or src.dtype != np.float32
            or not src.flags.c_contiguous):
        return src[idx]
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if idx.size:
        if idx.min() < 0:  # numpy wrap semantics, matching the fallback
            idx = np.where(idx < 0, idx + src.shape[0], idx)
        if idx.min() < 0 or idx.max() >= src.shape[0]:
            raise IndexError(
                "gather_rows index out of range for %d rows" % src.shape[0])
    out = np.empty((len(idx), src.shape[1]), dtype=np.float32)
    lib.gather_rows_f32(
        src.ctypes.data, out.ctypes.data, idx.ctypes.data,
        len(idx), src.shape[1])
    return out


def one_hot(labels, num_classes):
    """Labels are validated on BOTH paths: the raw C loop would corrupt the
    heap on an out-of-range label, and numpy's eye-indexing silently wraps
    negatives — an explicit IndexError beats either."""
    lib = _load()
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    if labels.size and (labels.min() < 0 or labels.max() >= num_classes):
        raise IndexError(
            "one_hot label out of range [0, %d)" % num_classes)
    if lib is None:
        return np.eye(num_classes, dtype=np.float32)[labels]
    out = np.empty((len(labels), num_classes), dtype=np.float32)
    lib.one_hot_f32(labels.ctypes.data, out.ctypes.data,
                    len(labels), num_classes)
    return out


def permutation(n, seed):
    """Deterministic native Fisher-Yates permutation of arange(n)."""
    lib = _load()
    if lib is None:
        return np.random.RandomState(seed & 0xFFFFFFFF).permutation(n)
    idx = np.arange(n, dtype=np.int64)
    lib.shuffle_indices(idx.ctypes.data, n, seed)
    return idx

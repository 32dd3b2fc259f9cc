"""ctypes bindings for the native C++ runtime (oracle solver + prefetcher).

The library is built with ``make -C native`` (g++, OpenMP). Everything
degrades gracefully: if the .so is absent, ``available()`` is False and
callers fall back to pure-numpy / python paths. This mirrors the role of
the reference's native pieces — the Cython CPU solvers
(``solve_parallel_mc.pyx``) and torch's threaded data loading — without a
torch or Cython dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _lib_path():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "native", "libiftnative.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path):
        # try building once
        try:
            import subprocess
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64, u64, p8, pd, pv = (ctypes.c_int64, ctypes.c_uint64,
                            ctypes.POINTER(ctypes.c_uint8),
                            ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)
    lib.ift_masked_conv_f64.argtypes = [pd, pd, pd] + [i64] * 7
    lib.ift_inv_conv_solve_f64.argtypes = [pd, pd, pd] + [i64] * 7
    lib.ift_num_threads.restype = ctypes.c_int
    lib.ift_prefetch_create.restype = pv
    lib.ift_prefetch_create.argtypes = [p8, i64, i64, i64, ctypes.c_int,
                                        u64, i64]
    lib.ift_prefetch_next.argtypes = [pv, p8]
    lib.ift_prefetch_next.restype = ctypes.c_int
    lib.ift_prefetch_batches_per_epoch.argtypes = [pv]
    lib.ift_prefetch_batches_per_epoch.restype = i64
    lib.ift_prefetch_destroy.argtypes = [pv]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _as_f64(x):
    return np.ascontiguousarray(x, dtype=np.float64)


def masked_conv(y, k, groups=1):
    """float64 oracle of the TL masked conv (z = T y)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    y = _as_f64(y)
    k = _as_f64(k)
    z = np.zeros_like(y)
    b, c, h, w = y.shape
    kh, kw = k.shape[2], k.shape[3]
    pd = ctypes.POINTER(ctypes.c_double)
    lib.ift_masked_conv_f64(y.ctypes.data_as(pd), k.ctypes.data_as(pd),
                            z.ctypes.data_as(pd), b, c, h, w, kh, kw, groups)
    return z


def inv_conv_solve(x, k, groups=1):
    """float64 oracle of the raster back-substitution (y = T^{-1} x)."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    x = _as_f64(x)
    k = _as_f64(k)
    y = np.zeros_like(x)
    b, c, h, w = x.shape
    kh, kw = k.shape[2], k.shape[3]
    pd = ctypes.POINTER(ctypes.c_double)
    lib.ift_inv_conv_solve_f64(x.ctypes.data_as(pd), k.ctypes.data_as(pd),
                               y.ctypes.data_as(pd), b, c, h, w, kh, kw,
                               groups)
    return y


class NativePrefetcher:
    """Threaded shuffled-batch producer over a uint8 dataset array."""

    def __init__(self, data: np.ndarray, batch_size: int, shuffle=True,
                 seed=0, capacity=4):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._data = np.ascontiguousarray(data, dtype=np.uint8)
        n = self._data.shape[0]
        if n < batch_size:
            raise ValueError(
                f"NativePrefetcher: {n} samples < batch_size={batch_size} "
                f"(the worker assembles full batches only)")
        self.item_shape = self._data.shape[1:]
        item_bytes = int(np.prod(self.item_shape))
        self.batch_size = batch_size
        self._handle = lib.ift_prefetch_create(
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, item_bytes, batch_size, int(shuffle), seed, capacity)
        self.batches_per_epoch = int(
            lib.ift_prefetch_batches_per_epoch(self._handle))

    def next(self) -> np.ndarray:
        out = np.empty((self.batch_size,) + tuple(self.item_shape), np.uint8)
        rc = self._lib.ift_prefetch_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise RuntimeError(
                "NativePrefetcher: the worker thread exited with no batch "
                "available (stopped or invalid geometry)")
        return out

    def close(self):
        if self._handle:
            self._lib.ift_prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

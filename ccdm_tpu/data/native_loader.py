"""ctypes bridge to the native mmap dataset cache (native/dataset_cache.cpp).

Host-side fallback path for datasets that exceed HBM: the DatasetBundle is
serialized once to a flat binary cache; the C++ library mmaps it and serves
threaded uint8 batch gathers (optional hflip) into caller-owned numpy
buffers — zero Python-loop overhead, no h5py in the hot path.

Build once with `make -C native`; `NativeDatasetCache.available()` reports
whether the shared library exists (and builds it on demand when a toolchain
is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libccdm_io.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ccdm_cache_open.restype = ctypes.c_void_p
    lib.ccdm_cache_open.argtypes = [ctypes.c_char_p]
    lib.ccdm_cache_close.argtypes = [ctypes.c_void_p]
    lib.ccdm_cache_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64)]
    lib.ccdm_cache_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.ccdm_cache_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64,
    ]
    _lib = lib
    return lib


class NativeDatasetCache:
    """mmap-backed uint8 image + f32 label store with threaded gather."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libccdm_io.so unavailable (no native toolchain?)")
        self._lib = lib
        self._handle = lib.ccdm_cache_open(path.encode())
        if not self._handle:
            raise IOError(f"cannot open dataset cache {path}")
        info = (ctypes.c_uint64 * 5)()
        lib.ccdm_cache_info(self._handle, info)
        self.n, self.h, self.w, self.c, self.ldim = (int(v) for v in info)

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    @staticmethod
    def write(path: str, images: np.ndarray, labels: np.ndarray) -> None:
        """Serialize uint8 NHWC images + labels to the cache format."""
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libccdm_io.so unavailable")
        images = np.ascontiguousarray(images, dtype=np.uint8)
        labels2d = np.ascontiguousarray(
            np.asarray(labels, np.float32).reshape(len(labels), -1)
        )
        n, h, w, c = images.shape
        rc = lib.ccdm_cache_write(
            path.encode(),
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels2d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, h, w, c, labels2d.shape[1],
        )
        if rc != 0:
            raise IOError(f"cache write failed: {path}")

    def gather(self, indices: np.ndarray, hflip: bool = False, seed: int = 0,
               num_threads: int = 0,
               out: Optional[Tuple[np.ndarray, np.ndarray]] = None):
        """Gather a batch: returns (images [B,H,W,C] uint8, labels [B,ldim])."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        bs = len(idx)
        if out is None:
            imgs = np.empty((bs, self.h, self.w, self.c), np.uint8)
            labs = np.empty((bs, self.ldim), np.float32)
        else:
            imgs, labs = out
        rc = self._lib.ccdm_cache_gather(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), bs,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(hflip), seed, num_threads,
        )
        if rc != 0:
            raise RuntimeError("native gather failed")
        return imgs, labs

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.ccdm_cache_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""ctypes bindings for the native C++ data-loading core
(native/tpuloader.cpp — see that file's header for the design rationale).

Gracefully degrades: if libtpuloader.so is absent it tries `make -C
native` once, and otherwise callers fall back to the Python-thread
DataLoader (data/loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_ROOT, "native", "libtpuloader.so")
_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.tl_decode.restype = ctypes.POINTER(ctypes.c_float)
    lib.tl_decode.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
    lib.tl_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.tl_create.restype = ctypes.c_void_p
    lib.tl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                              ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_uint64]
    lib.tl_next.restype = ctypes.c_int
    lib.tl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float)]
    lib.tl_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode one JPEG/PNG natively -> float32 RGB HWC [0,1]."""
    lib = _load_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    ptr = lib.tl_decode(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c))
    if not ptr:
        return None
    n = h.value * w.value * c.value
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.tl_free(ptr)
    return arr.reshape(h.value, w.value, c.value)


class NativeCropLoader:
    """Background-threaded random-crop HR batch producer. Yields
    (batch, crop, crop, 3) float32 batches; pair with the on-device
    degradation pipeline to synthesize LR."""

    def __init__(self, paths: List[str], crop: int = 128,
                 batch_size: int = 16, n_threads: int = 4, seed: int = 0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libtpuloader.so unavailable "
                               "(make -C native failed?)")
        self._lib = lib
        self.crop = crop
        self.batch_size = batch_size
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._handle = lib.tl_create(arr, len(paths), crop, batch_size,
                                     n_threads, seed)
        if not self._handle:
            raise RuntimeError("tl_create failed")
        self._buf = np.empty(batch_size * crop * crop * 3, np.float32)

    def next(self) -> np.ndarray:
        rc = self._lib.tl_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise RuntimeError("tl_next failed")
        return self._buf.reshape(self.batch_size, self.crop, self.crop,
                                 3).copy()

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if self._handle:
            self._lib.tl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

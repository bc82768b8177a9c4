"""ctypes bridge to the native (C++) data loader.

`native/hfaio.cpp` implements decode (libpng/libjpeg) + bilinear resize +
normalize on pthread workers with a bounded ready-batch ring — the
TPU-host equivalent of the reference's DataLoader workers / DataLoaderX
prefetch thread / DALI decode (SURVEY.md §2.4). Compiled on first use
(g++, cached as native/libhfaio.so); `NativeImageLoader` degrades to the
pure-python `BatchIterator` path when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libhfaio.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "hfaio.cpp")


def build_library(force: bool = False) -> str | None:
    """Compile libhfaio.so (cached). Returns the path or None."""
    if os.path.exists(_SO_PATH) and not force:
        return _SO_PATH
    if not os.path.exists(_SRC_PATH):
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC_PATH, "-o", _SO_PATH,
           "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO_PATH


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = build_library()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.hfaio_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.hfaio_decode.restype = ctypes.c_int
        lib.hfaio_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
            ctypes.c_int]
        lib.hfaio_create.restype = ctypes.c_void_p
        lib.hfaio_next.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.POINTER(ctypes.c_int)]
        lib.hfaio_next.restype = ctypes.c_int
        lib.hfaio_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def decode_image(path: str, size: int) -> np.ndarray | None:
    """One image → float32 (size, size, 3) in [-1, 1] via native code."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.float32)
    rc = lib.hfaio_decode(
        path.encode(), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


class NativeImageLoader:
    """Prefetching image-batch stream over a list of paths.

    Yields (images (B, size, size, 3) float32 [-1,1], indices (B,)).
    Labels/aux data are joined python-side by index (the reference splits
    the same way: image decode is the expensive part)."""

    def __init__(self, paths: list[str], size: int, batch_size: int,
                 *, shuffle: bool = True, workers: int = 4, seed: int = 0,
                 drop_last: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.size = size
        self.batch_size = batch_size
        self._paths_bytes = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(paths))(*self._paths_bytes)
        self._handle = lib.hfaio_create(
            arr, len(paths), size, batch_size, workers, int(shuffle),
            seed, int(drop_last))
        if not self._handle:
            raise RuntimeError("hfaio_create failed")

    def next(self) -> tuple[np.ndarray, np.ndarray]:
        out = np.empty((self.batch_size, self.size, self.size, 3),
                       np.float32)
        idx = np.empty((self.batch_size,), np.int32)
        n = self._lib.hfaio_next(
            self._handle,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if n < 0:
            raise StopIteration
        return out[:n], idx[:n]

    def __iter__(self):
        while True:
            yield self.next()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.hfaio_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

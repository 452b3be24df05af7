"""ctypes bindings for the native frame-ingestion library (native/vstream_io.cpp).

Provides fused JPEG decode+resize and a background-prefetch frame loader —
the native data path that replaces decord in the reference stack. Falls back
to PIL when the shared library hasn't been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_SEARCHED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.environ.get("VSTREAM_IO_LIB", ""),
        os.path.join(here, "libvstream_io.so"),
        os.path.join(here, "..", "..", "native", "libvstream_io.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            lib = ctypes.CDLL(c)
            lib.vio_decode_file.restype = ctypes.c_int
            lib.vio_decode_batch.restype = ctypes.c_int
            lib.vio_loader_create.restype = ctypes.c_void_p
            lib.vio_loader_next.restype = ctypes.c_int
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return _find_lib() is not None


def decode_file(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Decode+resize one image file to uint8 RGB [out_h, out_w, 3]."""
    lib = _find_lib()
    if lib is None:
        from PIL import Image
        img = Image.open(path).convert("RGB").resize((out_w, out_h),
                                                     Image.BILINEAR)
        return np.asarray(img)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.vio_decode_file(path.encode(), out_h, out_w,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out


def decode_batch(paths: Sequence[str], out_h: int, out_w: int) -> np.ndarray:
    """Decode+resize a batch of files to uint8 [n, out_h, out_w, 3]."""
    lib = _find_lib()
    if lib is None:
        return np.stack([decode_file(p, out_h, out_w) for p in paths])
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.vio_decode_batch(arr, n, out_h, out_w,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


class PrefetchLoader:
    """Background-thread frame loader: decode overlaps device compute.

    Iterates uint8 RGB frames [out_h, out_w, 3] in path order. With the
    native library, decoding runs in a C++ worker thread ahead of
    consumption; the PIL fallback decodes synchronously.
    """

    def __init__(self, paths: Sequence[str], out_h: int, out_w: int,
                 prefetch_depth: int = 8):
        self.paths = list(paths)
        self.out_h, self.out_w = out_h, out_w
        self._lib = _find_lib()
        self._handle = None
        self._idx = 0
        if self._lib is not None:
            self._keepalive = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.vio_loader_create(
                self._keepalive, len(self.paths), out_h, out_w,
                prefetch_depth)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.out_h, self.out_w, 3), np.uint8)
            rc = self._lib.vio_loader_next(
                ctypes.c_void_p(self._handle),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if rc == 0:
                self.close()
                raise StopIteration
            return out
        if self._idx >= len(self.paths):
            raise StopIteration
        out = decode_file(self.paths[self._idx], self.out_h, self.out_w)
        self._idx += 1
        return out

    def close(self):
        if self._handle is not None:
            self._lib.vio_loader_destroy(ctypes.c_void_p(self._handle))
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

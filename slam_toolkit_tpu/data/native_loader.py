"""ctypes bindings for the native prefetching stereo loader.

The native side (native/loader.cpp) decodes PNG stereo pairs on a
background thread into a ring buffer, keeping host decode off the
critical path while the device computes — the runtime role the
reference's dataset layer plays in C++ (ref src/dataset.cpp:108-124),
kept native here per the framework's runtime design. Falls back to
cv2 decoding when the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libslamloader.so")


def _load_lib():
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_float)]
    lib.loader_close.argtypes = [ctypes.c_void_p]
    lib.decode_gray.restype = ctypes.c_int
    lib.decode_gray.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_int]
    return lib


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


class PrefetchLoader:
    """Iterates (left, right) float32 stereo pairs with native prefetch."""

    def __init__(self, left_paths: List[str], right_paths: List[str],
                 height: int, width: int, ring: int = 4):
        assert len(left_paths) == len(right_paths)
        self.n = len(left_paths)
        self.height, self.width = height, width
        self._i = 0
        if _LIB is not None:
            arr_l = (ctypes.c_char_p * self.n)(
                *[p.encode() for p in left_paths])
            arr_r = (ctypes.c_char_p * self.n)(
                *[p.encode() for p in right_paths])
            self._h = _LIB.loader_open(arr_l, arr_r, self.n, height, width,
                                       ring)
            self._native = True
        else:
            self._paths = (left_paths, right_paths)
            self._native = False

    def __len__(self) -> int:
        return self.n

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._i >= self.n:
            raise StopIteration
        if self._native:
            left = np.empty((self.height, self.width), np.float32)
            right = np.empty((self.height, self.width), np.float32)
            idx = _LIB.loader_next(
                self._h,
                left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if idx < 0:
                raise StopIteration
            self._i += 1
            return left, right
        import cv2
        lp, rp = self._paths[0][self._i], self._paths[1][self._i]
        self._i += 1
        left = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
        right = cv2.imread(rp, cv2.IMREAD_GRAYSCALE)
        return left.astype(np.float32), right.astype(np.float32)

    def close(self):
        if self._native and self._h:
            _LIB.loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_gray(path: str, height: int, width: int) -> Optional[np.ndarray]:
    """One-shot native PNG decode (None if unavailable/failed)."""
    if _LIB is None:
        return None
    out = np.empty((height, width), np.float32)
    rc = _LIB.decode_gray(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          height, width)
    return out if rc == 0 else None

"""ctypes bindings for the native frame-loading runtime (native/frameloader.cpp).

Gracefully degrades: if the shared library isn't built (``make -C native``)
or libjpeg is missing, callers fall back to cv2.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libframeloader.so"),
        os.path.join(os.path.dirname(__file__), "libframeloader.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.fl_probe.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
            lib.fl_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int]
            lib.fl_decode_batch.restype = ctypes.c_int
            lib.fl_prefetch_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.fl_prefetch_open.restype = ctypes.c_void_p
            lib.fl_prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.c_void_p, ctypes.c_void_p]
            lib.fl_prefetch_get.restype = ctypes.c_int
            lib.fl_prefetch_close.argtypes = [ctypes.c_void_p]
            _LIB = lib
            return lib
    return None


def available() -> bool:
    return _find_lib() is not None


def _c_paths(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def probe(path: str) -> Tuple[int, int]:
    lib = _find_lib()
    w, h = ctypes.c_int(), ctypes.c_int()
    if lib.fl_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(f"failed to probe {path}")
    return w.value, h.value


def decode_batch(paths: List[str], lo_size: Optional[Tuple[int, int]] = None,
                 threads: int = 4, want_hi: bool = True
                 ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Decode JPEGs -> (hi uint8 [N,H,W,3] BGR or None, lo uint8 or None).

    ``want_hi=False`` skips the full-resolution copies (training samplers
    only need the model-resolution frames).
    """
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native frameloader not built (make -C native)")
    w, h = probe(paths[0])
    n = len(paths)
    hi = np.empty((n, h, w, 3), np.uint8) if want_hi else None
    hi_ptr = hi.ctypes.data_as(ctypes.c_void_p) if want_hi else None
    lo = None
    lo_ptr, lw, lh = None, 0, 0
    if lo_size is not None:
        lh, lw = lo_size
        lo = np.empty((n, lh, lw, 3), np.uint8)
        lo_ptr = lo.ctypes.data_as(ctypes.c_void_p)
    errors = lib.fl_decode_batch(
        _c_paths(paths), n, w, h, hi_ptr, lw, lh, lo_ptr, threads)
    if errors:
        raise IOError(f"{errors} frames failed to decode (size mismatch?)")
    return hi, lo


class FramePrefetcher:
    """Ring-buffer background decoder; frames must be consumed in order."""

    def __init__(self, paths: List[str],
                 lo_size: Optional[Tuple[int, int]] = None, ring: int = 16):
        self._lib = _find_lib()
        if self._lib is None:
            raise RuntimeError("native frameloader not built")
        self.w, self.h = probe(paths[0])
        self.lo_size = lo_size
        lh, lw = lo_size if lo_size else (0, 0)
        self.n = len(paths)
        self._handle = self._lib.fl_prefetch_open(
            _c_paths(paths), self.n, self.w, self.h, lw, lh, ring)

    def get(self, i: int) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        hi = np.empty((self.h, self.w, 3), np.uint8)
        lo = None
        lo_ptr = None
        if self.lo_size:
            lo = np.empty((*self.lo_size, 3), np.uint8)
            lo_ptr = lo.ctypes.data_as(ctypes.c_void_p)
        err = self._lib.fl_prefetch_get(
            self._handle, i, hi.ctypes.data_as(ctypes.c_void_p), lo_ptr)
        if err:
            raise IOError(f"frame {i} failed to decode (code {err})")
        return hi, lo

    def close(self):
        if self._handle:
            self._lib.fl_prefetch_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

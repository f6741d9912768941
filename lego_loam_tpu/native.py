"""ctypes bindings for the native host runtime (`native/lego_native.cpp`).

Provides the C++ fast paths — scan prep, PointCloud2 payload decode, KITTI
reads, and the double-buffered background scan feeder (≙ the reference's
Channel<T> + worker threads) — with transparent numpy fallbacks when the
shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "native", "liblego_native.so"),
    os.path.join(os.path.dirname(__file__), "liblego_native.so"),
]

_lib = None
for p in _LIB_PATHS:
    if os.path.isfile(p):
        try:
            _lib = ctypes.CDLL(os.path.abspath(p))
            break
        except OSError:
            _lib = None

if _lib is not None:
    _lib.lego_prep_cloud.restype = ctypes.c_int
    _lib.lego_prep_cloud.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib.lego_read_kitti_bin.restype = ctypes.c_int
    _lib.lego_read_kitti_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
    ]
    _lib.lego_decode_pointcloud2.restype = ctypes.c_int
    _lib.lego_decode_pointcloud2.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib.lego_feeder_create.restype = ctypes.c_void_p
    _lib.lego_feeder_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    _lib.lego_feeder_next.restype = ctypes.c_long
    _lib.lego_feeder_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
    ]
    _lib.lego_feeder_destroy.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _lib is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def prep_cloud(pts: np.ndarray, cap: int):
    """NaN-filter + pad to (cap, 3) float32 + (cap,) bool mask."""
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    if _lib is None:
        mask = np.isfinite(pts).all(axis=1)
        buf = np.zeros((cap, 3), np.float32)
        m = np.zeros((cap,), bool)
        k = min(len(pts), cap)
        buf[:k] = np.nan_to_num(pts[:k])
        m[:k] = mask[:k]
        return buf, m
    buf = np.empty((cap, 3), np.float32)
    mask = np.empty((cap,), np.uint8)
    _lib.lego_prep_cloud(
        _fptr(pts), len(pts), cap, _fptr(buf),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return buf, mask.astype(bool)


def read_kitti_bin(path: str, cap: int = 1 << 18) -> np.ndarray:
    if _lib is None:
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        return raw[:cap, :3].copy()
    out = np.empty((cap, 3), np.float32)
    n = _lib.lego_read_kitti_bin(path.encode(), _fptr(out), cap)
    if n < 0:
        raise FileNotFoundError(path)
    return out[:n]


class ScanFeeder:
    """Background-thread KITTI scan feeder with Channel semantics.

    `latest_wins=False` blocks the producer when the queue is full (the
    projection->FA channel, main.cpp:10); `latest_wins=True` drops the oldest
    (the FA->MO channel, main.cpp:11)."""

    def __init__(self, files: Sequence[str], cap: int,
                 latest_wins: bool = False, depth: int = 2):
        self.cap = cap
        self._files = list(files)
        if _lib is None:
            self._handle = None
            self._iter = iter(self._files)
            self._idx = -1
            return
        arr = (ctypes.c_char_p * len(self._files))(
            *[f.encode() for f in self._files]
        )
        self._keepalive = arr
        self._handle = _lib.lego_feeder_create(
            arr, len(self._files), cap, int(latest_wins), depth
        )

    def next(self):
        """Returns (index, buf (cap,3), mask (cap,), timestamp) or None."""
        if self._handle is None:
            try:
                path = next(self._iter)
            except StopIteration:
                return None
            self._idx += 1
            raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
            buf, mask = prep_cloud(raw, self.cap)
            return self._idx, buf, mask, 0.1 * self._idx
        buf = np.empty((self.cap, 3), np.float32)
        mask = np.empty((self.cap,), np.uint8)
        ts = ctypes.c_double()
        idx = _lib.lego_feeder_next(
            self._handle, _fptr(buf),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(ts),
        )
        if idx < 0:
            return None
        return idx, buf, mask.astype(bool), ts.value

    def close(self):
        if self._handle is not None:
            _lib.lego_feeder_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""Native (C++) host-pipeline kernels with transparent Python fallback.

``lib()`` compiles dctseg/native/edge_map.cc on first use (g++ -O3 -shared,
cached next to the source) and exposes it via ctypes; when no toolchain is
available everything falls back to the scipy/numpy implementations, so the
framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "edge_map.cc")
_SO = os.path.join(_DIR, "_libdctseg.so")
_HASH = _SO + ".sha256"  # source hash the .so was built from

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _needs_build() -> bool:
    """Rebuild keyed on source CONTENT hash, not mtime: the .so is built
    locally (never committed — it carries -march=native code that could
    SIGILL on a foreign host), and fresh-clone mtimes are unreliable."""
    if not os.path.exists(_SO):
        return True
    try:
        with open(_HASH) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def _build() -> bool:
    for extra in (["-march=native"], []):  # fall back for portability
        cmd = ["g++", "-O3", *extra, "-shared", "-fPIC", "-o", _SO, _SRC]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            with open(_HASH, "w") as f:
                f.write(_src_hash())
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _load() -> Optional[ctypes.CDLL]:
    try:
        l = ctypes.CDLL(_SO)
        l.edge_map_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        l.zscore_nonzero_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64]
        l.nonzero_stats_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        l.normalize_inplace_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_float]
        return l
    except (OSError, AttributeError):
        return None


def _selftest(l: ctypes.CDLL) -> bool:
    """Tiny numerical probe before trusting a loaded binary."""
    a = np.array([0.0, 2.0, 4.0, 0.0], np.float32)
    mean = ctypes.c_double()
    std = ctypes.c_double()
    try:
        l.nonzero_stats_f32(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size,
            ctypes.byref(mean), ctypes.byref(std))
    except Exception:
        return False
    return abs(mean.value - 3.0) < 1e-6 and abs(std.value - 1.0) < 1e-6


def lib() -> Optional[ctypes.CDLL]:
    """The compiled library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _needs_build() and not _build():
            return None
        l = _load()
        if l is None or not _selftest(l):
            # stale/foreign binary: rebuild once from source
            l = _load() if _build() else None
            if l is not None and not _selftest(l):
                l = None
        _lib = l
        return _lib


def native_edge_map(label: np.ndarray) -> Optional[np.ndarray]:
    """One-pass edge map; None if the native library is unavailable."""
    l = lib()
    if l is None:
        return None
    label = np.ascontiguousarray(label, np.int32)
    out = np.empty(label.shape, np.uint8)
    d0, d1, d2 = label.shape
    l.edge_map_i32(
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        d0, d1, d2)
    return out


def nonzero_stats(chan: np.ndarray):
    """(mean, std) over nonzero elements of a contiguous array (any order);
    numpy fallback when the native lib is unavailable."""
    l = lib()
    if l is not None and (chan.flags["C_CONTIGUOUS"]
                          or chan.flags["F_CONTIGUOUS"]) \
            and chan.dtype == np.float32:
        mean = ctypes.c_double()
        std = ctypes.c_double()
        l.nonzero_stats_f32(
            chan.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            chan.size, ctypes.byref(mean), ctypes.byref(std))
        return mean.value, std.value
    mask = chan != 0
    if not mask.any():
        return 0.0, 0.0
    vals = chan[mask]
    return float(vals.mean()), float(vals.std())


def normalize_inplace(chan: np.ndarray, mean: float, std: float) -> None:
    """In-place nonzero z-score of a C-contiguous float32 array."""
    inv = 1.0 / (std + 1e-8)
    l = lib()
    if l is not None and chan.flags["C_CONTIGUOUS"] \
            and chan.dtype == np.float32 and chan.flags["WRITEABLE"]:
        l.normalize_inplace_f32(
            chan.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            chan.size, np.float32(mean), np.float32(inv))
        return
    nz = chan != 0
    chan[nz] = (chan[nz] - mean) * inv


def native_zscore(img: np.ndarray) -> Optional[np.ndarray]:
    """Fused per-modality nonzero z-score; None when unavailable."""
    l = lib()
    if l is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    n = int(np.prod(img.shape[:-1]))
    m = img.shape[-1]
    l.zscore_nonzero_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, m)
    return out

"""ctypes bindings for the native data-loading core (native/dataloader.cc).

Provides fast threaded 16-bit depth-PNG decode, RGB decode with fused
ImageNet normalization, and deterministic sparse sampling. Builds the
shared library on first use (``make -C native``) and degrades gracefully to
the PIL/NumPy path when the toolchain or library is unavailable:
callers must check ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnlspn_data.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.nl_png_dims.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.nl_decode_depth_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.nl_decode_rgb_norm.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        lib.nl_decode_depth_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.nl_decode_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.nl_sparse_sample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64]
        lib.nl_sparse_sample.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def png_dims(path: str):
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.nl_png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc:
        raise IOError(f"cannot read PNG header: {path}")
    return h.value, w.value


def decode_depth_png(path: str) -> np.ndarray:
    """16-bit KITTI depth PNG -> float32 (H, W) meters."""
    lib = _load()
    h, w = png_dims(path)
    out = np.empty((h, w), np.float32)
    rc = lib.nl_decode_depth_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w)
    if rc:
        raise IOError(f"depth PNG decode failed (rc={rc}): {path}")
    return out


def decode_rgb_norm(path: str, h: int, w: int) -> np.ndarray:
    """8-bit RGB PNG/JPEG -> float32 (H, W, 3), ImageNet-normalized."""
    lib = _load()
    out = np.empty((h, w, 3), np.float32)
    rc = lib.nl_decode_rgb_norm(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w)
    if rc:
        raise IOError(f"RGB decode failed (rc={rc}): {path}")
    return out


def _paths_array(paths: List[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_depth_batch(paths: List[str], h: int, w: int,
                       num_threads: int = 0) -> np.ndarray:
    """Threaded batch decode -> float32 (N, H, W)."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w), np.float32)
    bad = lib.nl_decode_depth_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, num_threads)
    if bad:
        raise IOError(f"{bad}/{n} depth decodes failed")
    return out


def decode_rgb_batch(paths: List[str], h: int, w: int,
                     num_threads: int = 0) -> np.ndarray:
    """Threaded batch decode+normalize -> float32 (N, H, W, 3)."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, h, w, 3), np.float32)
    bad = lib.nl_decode_rgb_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, num_threads)
    if bad:
        raise IOError(f"{bad}/{n} RGB decodes failed")
    return out


def sparse_sample(dep: np.ndarray, num_sample: int, seed: int) -> np.ndarray:
    """Keep num_sample random valid pixels of a (H, W) or (H, W, 1) plane."""
    lib = _load()
    out = np.ascontiguousarray(dep, np.float32).copy()
    lib.nl_sparse_sample(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
        num_sample, ctypes.c_uint64(seed))
    return out.reshape(dep.shape)

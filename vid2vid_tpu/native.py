"""ctypes bindings for the native CPU kernel library.

The reference shipped correlation / resample2d / channelnorm as CUDA
extensions; our device path is Pallas/XLA, and this C++ library provides
the same ops on host — an independent parity oracle for kernel tests and
a fast option for host-side preprocessing. Builds on demand with `make`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvid2vid_kernels.so")
_lib = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    _lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    fp = ctypes.POINTER(ctypes.c_float)
    _lib.correlation_forward.argtypes = [fp, fp, fp, i64, i64, i64, i64, i64, i64]
    _lib.resample2d_forward.argtypes = [fp, fp, fp, i64, i64, i64, i64]
    _lib.channelnorm_forward.argtypes = [fp, fp, i64, i64, i64, i64]
    return _lib


def _as_f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), np.float32)


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def correlation_native(
    f1, f2, max_displacement: int = 20, stride2: int = 2
) -> np.ndarray:
    """(B,H,W,C) x2 -> (B,H,W,D*D) cost volume, dy-major channel order."""
    lib = _ensure_built()
    f1, f2 = _as_f32(f1), _as_f32(f2)
    b, h, w, c = f1.shape
    d = 2 * (max_displacement // stride2) + 1
    out = np.empty((b, h, w, d * d), np.float32)
    lib.correlation_forward(
        _ptr(f1), _ptr(f2), _ptr(out), b, h, w, c, max_displacement, stride2
    )
    return out


def flow_warp_native(img, flow) -> np.ndarray:
    """(B,H,W,C), (B,H,W,2) -> bilinear border-clamped warp."""
    lib = _ensure_built()
    img, flow = _as_f32(img), _as_f32(flow)
    b, h, w, c = img.shape
    out = np.empty_like(img)
    lib.resample2d_forward(_ptr(img), _ptr(flow), _ptr(out), b, h, w, c)
    return out


def channel_norm_native(x) -> np.ndarray:
    """(B,H,W,C) -> (B,H,W,1) L2 norm over channels."""
    lib = _ensure_built()
    x = _as_f32(x)
    b, h, w, c = x.shape
    out = np.empty((b, h, w, 1), np.float32)
    lib.channelnorm_forward(_ptr(x), _ptr(out), b, h, w, c)
    return out

"""ctypes binding for the native augmentation engine (runtime/augment.cpp).

Builds libaugment.so on first use (g++ -O3 -fopenmp); falls back to the
cv2/numpy transforms if the toolchain is unavailable. Semantics match
data/transforms.py exactly (tests/test_native_augment.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_SO = os.path.join(_HERE, "libaugment.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=180,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.augment_sample.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.augment_batch.argtypes = [
            f32p, f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, f32p, i32p, f32p, f32p, i32p, i32p, f32p, f32p, i32p,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def augment_sample(a: np.ndarray, b: np.ndarray, mask: np.ndarray,
                   flip_d: int, angle: float,
                   a_cb: bool, a_alpha: float, a_beta: float, a_blur: int,
                   b_cb: bool, b_alpha: float, b_beta: float, b_blur: int,
                   normalize: bool = True):
    """In-place native augmentation. Arrays must be contiguous float32;
    a, b: (H, W, 3); mask: (H, W). flip_d=-2 disables flip; angle=0 disables
    rotation; blur in {0, 3, 5}."""
    lib = get_lib()
    assert lib is not None
    h, w = mask.shape
    for arr in (a, b, mask):
        assert arr.dtype == np.float32 and arr.flags.c_contiguous
    lib.augment_sample(_fp(a), _fp(b), _fp(mask), h, w,
                       int(flip_d), float(angle),
                       int(a_cb), float(a_alpha), float(a_beta), int(a_blur),
                       int(b_cb), float(b_alpha), float(b_beta), int(b_blur),
                       int(normalize))
    return a, b, mask

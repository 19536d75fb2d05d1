"""ctypes bindings for the native host runtime (native/cc_label.cpp).

Auto-builds the shared library with g++ on first use (cached); callers fall
back to the pure-Python/scipy paths when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcclabel.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "cc_label.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not os.path.exists(_SRC_PATH) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.cc_label_u8.restype = ctypes.c_int32
        lib.cc_label_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.cc_stats.restype = None
        lib.cc_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def cc_label(mask: np.ndarray) -> Optional[Tuple[int, np.ndarray]]:
    """Native 8-connectivity labeling; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask_u8 = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w = mask_u8.shape
    labels = np.empty((h, w), dtype=np.int32)
    n = lib.cc_label_u8(
        mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(n), labels


def cc_stats(labels: np.ndarray, num: int) -> Optional[np.ndarray]:
    """(num, 5) int32 [area, x0, y0, x1, y1] per component, native path."""
    lib = get_lib()
    if lib is None or num == 0:
        return None if lib is None else np.zeros((0, 5), np.int32)
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    out = np.empty((num, 5), dtype=np.int32)
    lib.cc_stats(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.shape[0],
        labels.shape[1],
        num,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out

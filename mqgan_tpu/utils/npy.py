"""Fast .npy IO with an optional native C++ backend.

The training hot loop reads thousands of small .npy mel files per epoch
(reference train.py:108-114 uses np.load per item in DataLoader workers).
Here the default reader uses the native loader from native/io_loader.cpp
(mmap + header parse + memcpy, no Python object churn per element) when the
shared library has been built, falling back to np.load transparently.

Build the native library with:  make -C native
"""

from __future__ import annotations

import ctypes
import os
import struct
import sys
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_LIB_FAILED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        path = os.path.abspath(os.path.join(_NATIVE_DIR, "libmqgan_io.so"))
        if not os.path.exists(path):
            _LIB_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(path)
            lib.mq_load_npy_f32.restype = ctypes.c_int64
            lib.mq_load_npy_f32.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),  # shape out (2)
                ctypes.POINTER(ctypes.c_void_p),  # data out (malloc'd)
            ]
            lib.mq_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except OSError:
            _LIB_FAILED = True
        return _LIB


def load_npy(path: str, use_native: bool = True) -> np.ndarray:
    """Load a 1-D or 2-D .npy file as float32 (mels) or raw dtype (tokens)."""
    lib = _load_lib() if use_native else None
    if lib is not None:
        shape = (ctypes.c_int64 * 2)(0, 0)
        data_ptr = ctypes.c_void_p()
        n = lib.mq_load_npy_f32(path.encode(), shape, ctypes.byref(data_ptr))
        if n >= 0:
            try:
                buf = ctypes.cast(
                    data_ptr, ctypes.POINTER(ctypes.c_float * n)
                ).contents
                arr = np.frombuffer(buf, dtype=np.float32, count=n).copy()
            finally:
                lib.mq_free(data_ptr)
            if shape[1] > 0:
                return arr.reshape(shape[0], shape[1])
            return arr.reshape(shape[0])
        # negative => unsupported dtype/layout; fall through to np.load
    return np.load(path)


def save_npy(path: str, arr: np.ndarray) -> None:
    np.save(path, arr)

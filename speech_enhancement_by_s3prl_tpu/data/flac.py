"""FLAC decoding via the native libseio decoder (native/seio.cpp).

Loaded through ctypes; the shared library is built on demand with the
repo's toolchain (``make -C native``) the first time a FLAC file is read.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native"
)
_LIB: Optional[ctypes.CDLL] = None


def _load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libseio.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.seio_decode_flac.restype = ctypes.c_int
    lib.seio_decode_flac.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.seio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (samples (channels, time) float32, rate)."""
    lib = _load_library()
    with open(path, "rb") as f:
        raw = f.read()
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    out = ctypes.POINTER(ctypes.c_float)()
    n_samples = ctypes.c_int64()
    n_channels = ctypes.c_int()
    rate = ctypes.c_int()
    rc = lib.seio_decode_flac(
        buf, len(raw), ctypes.byref(out), ctypes.byref(n_samples),
        ctypes.byref(n_channels), ctypes.byref(rate),
    )
    if rc != 0:
        raise ValueError(f"FLAC decode failed ({rc}): {path}")
    try:
        n = n_samples.value * n_channels.value
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.seio_free(out)
    return (
        arr.reshape(n_samples.value, n_channels.value).T.copy(),
        rate.value,
    )

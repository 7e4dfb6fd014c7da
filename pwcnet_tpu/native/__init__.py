"""ctypes bindings for the native decoder/loader (``decoder.cc``).

The library is built on demand with g++ (cached next to the source); every
entry point degrades to the pure-Python implementations in
``pwcnet_tpu.io`` when the toolchain or the build is unavailable, so the
framework never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "decoder.cc")
_LIB_PATH = os.path.join(_HERE, "_libpwcnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        for name, argtypes in [
            ("pwc_flo_dims", [u8p, ctypes.c_size_t, i32p, i32p]),
            ("pwc_flo_data", [u8p, ctypes.c_size_t, f32p]),
            ("pwc_ppm_dims", [u8p, ctypes.c_size_t, i32p, i32p]),
            ("pwc_ppm_data", [u8p, ctypes.c_size_t, f32p]),
            ("pwc_pfm_dims", [u8p, ctypes.c_size_t, i32p, i32p, i32p]),
            ("pwc_pfm_data", [u8p, ctypes.c_size_t, f32p]),
            ("pwc_decode_batch",
             [ctypes.POINTER(ctypes.c_char_p)] * 3
             + [ctypes.c_int] * 4 + [f32p] * 4),
        ]:
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _buf(data: bytes):
    arr = np.frombuffer(data, np.uint8)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_flo(path: str) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    p, n = _buf(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.pwc_flo_dims(p, n, ctypes.byref(h), ctypes.byref(w)):
        raise ValueError(f"{path}: bad .flo")
    out = np.empty((h.value, w.value, 2), np.float32)
    if lib.pwc_flo_data(p, n, _fptr(out)):
        raise ValueError(f"{path}: bad .flo data")
    return out


def read_ppm(path: str) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    p, n = _buf(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.pwc_ppm_dims(p, n, ctypes.byref(h), ctypes.byref(w)):
        raise ValueError(f"{path}: bad .ppm")
    out = np.empty((h.value, w.value, 3), np.float32)
    if lib.pwc_ppm_data(p, n, _fptr(out)):
        raise ValueError(f"{path}: bad .ppm data")
    return out


def read_pfm(path: str) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    p, n = _buf(data)
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    if lib.pwc_pfm_dims(p, n, ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c)):
        raise ValueError(f"{path}: bad .pfm")
    out = np.empty((h.value, w.value, c.value), np.float32)
    if lib.pwc_pfm_data(p, n, _fptr(out)):
        raise ValueError(f"{path}: bad .pfm data")
    return out[..., 0] if c.value == 1 else out


def decode_batch(im1_paths: Sequence[str], im2_paths: Sequence[str],
                 flow_paths: Sequence[str], hw: Tuple[int, int],
                 num_threads: int = 8) -> Optional[dict]:
    """Threaded native decode of FlyingChairs-style (.ppm, .ppm, .flo)
    samples into a fixed-shape batch dict; None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    n = len(im1_paths)
    th, tw = hw
    im1 = np.empty((n, th, tw, 3), np.float32)
    im2 = np.empty((n, th, tw, 3), np.float32)
    flow = np.empty((n, th, tw, 2), np.float32)
    valid = np.empty((n, th, tw), np.float32)

    def carr(paths):
        return (ctypes.c_char_p * n)(*[p.encode() for p in paths])

    rc = lib.pwc_decode_batch(
        carr(im1_paths), carr(im2_paths), carr(flow_paths), n, th, tw,
        num_threads, _fptr(im1), _fptr(im2), _fptr(flow), _fptr(valid))
    if rc:
        raise IOError(f"native batch decode failed (code {rc})")
    return {"im1": im1, "im2": im2, "flow": flow, "valid": valid}

"""ctypes bindings for the native C++ patch decoder (native/patch_decoder.cpp).

Decodes an (input JPEG, label PNG) pair directly into numpy buffers — input
float32 HWC in [0, 1], label uint8 {0, 1} — identical to the PIL path of
data/dataset.py but without intermediate PIL objects/copies, and with the GIL
released for the whole call so PatchLoader's thread pool decodes in parallel.

The shared library is built on demand with g++ (see native/Makefile); when the
toolchain or libs are unavailable everything degrades gracefully to PIL
(``available()`` returns False).
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
_SO_PATH = os.path.join(_NATIVE_DIR, "libpatch_decoder.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "patch_decoder.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
             "-o", _SO_PATH, "-ljpeg", "-lpng"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _stale() -> bool:
    src = os.path.join(_NATIVE_DIR, "patch_decoder.cpp")
    try:
        return os.path.getmtime(_SO_PATH) < os.path.getmtime(src)
    except OSError:
        return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if (not os.path.exists(_SO_PATH) or _stale()) and not _build():
            if not os.path.exists(_SO_PATH):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.decode_patch_pair.restype = ctypes.c_int
            lib.decode_patch_pair.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.decode_patch_pair_u8.restype = ctypes.c_int
            lib.decode_patch_pair_u8.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int,
            ]
            if lib.decoder_abi_version() != 2:
                raise OSError("ABI mismatch")
        except (OSError, AttributeError):
            # missing symbols (a stale .so predating the ABI marker) must
            # degrade to PIL, not crash dataset construction
            _build_failed = True
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_patch_pair(
    input_path: str, label_path: str, size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one patch pair; raises RuntimeError with the native error code
    on failure (caller may fall back to PIL)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    inp = np.empty((size, size, 3), np.float32)
    lab = np.empty((size, size), np.uint8)
    rc = lib.decode_patch_pair(
        input_path.encode(), label_path.encode(),
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, size,
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed (code {rc}) for {input_path}")
    return inp, lab


def decode_patch_pair_u8(
    input_path: str, label_path: str, size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Raw-uint8 decode for the device-side preprocessing path: input uint8
    RGB (no scaling), label uint8 {0, 1}."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    inp = np.empty((size, size, 3), np.uint8)
    lab = np.empty((size, size), np.uint8)
    rc = lib.decode_patch_pair_u8(
        input_path.encode(), label_path.encode(),
        inp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size, size,
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed (code {rc}) for {input_path}")
    return inp, lab

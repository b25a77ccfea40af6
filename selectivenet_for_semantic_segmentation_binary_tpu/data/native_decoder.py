"""ctypes bindings for the native C++ patch decoder (native/patch_decoder.cpp).

Decodes an (input JPEG, label PNG) pair directly into numpy buffers — input
float32 HWC in [0, 1], label uint8 {0, 1} — identical to the PIL path of
data/dataset.py but without intermediate PIL objects/copies, and with the GIL
released for the whole call so PatchLoader's thread pool decodes in parallel.

The shared library is built on demand (same command as native/Makefile, which
delegates here as the single source of truth); when the toolchain or libs are
unavailable everything degrades gracefully to PIL (``available()`` returns
False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpatch_decoder.so")
_ABI_VERSION = 3  # must match decoder_abi_version() in patch_decoder.cpp

# the ONE definition of the build command (native/Makefile invokes this
# module so the flags cannot drift between the two build entry points)
BUILD_CMD = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "{src}", "-o", "{out}", "-ljpeg", "-lpng"]

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "patch_decoder.cpp")
    if not os.path.exists(src):
        return False
    # compile to a per-process temp name and os.replace into place: a direct
    # -o to the final path can be dlopen'ed half-written by a concurrent
    # process (fleet/sweep children share the repo checkout), and a killed
    # build would leave a truncated .so whose fresh mtime permanently
    # disables the native path (same atomic-publish pattern as
    # utils/checkpoint.save_checkpoint)
    tmp = f"{_SO_PATH}.build.{os.getpid()}"
    cmd = [a.format(src=src, out=tmp) for a in BUILD_CMD]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
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
            # a STALE library must never be silently served after a failed
            # rebuild: a semantic C++ fix with an unchanged ABI would keep
            # producing old (wrong) pixels — degrade to PIL loudly instead
            if os.path.exists(_SO_PATH):
                warnings.warn(
                    f"{_SO_PATH} is older than its source and the rebuild "
                    f"failed; refusing the stale library — decoding falls "
                    f"back to PIL (run `make -C native` to rebuild)",
                    RuntimeWarning, stacklevel=2)
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
            if lib.decoder_abi_version() != _ABI_VERSION:
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


def _failed_path(rc: int, input_path: str, label_path: str) -> str:
    """Codes -2..-4 are JPEG-stage, -5..-8 PNG-stage (patch_decoder.cpp) —
    name the file that actually failed, not always the JPEG."""
    return label_path if rc <= -5 else input_path


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
        raise RuntimeError(f"native decode failed (code {rc}) for "
                           f"{_failed_path(rc, input_path, label_path)}")
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
        raise RuntimeError(f"native decode failed (code {rc}) for "
                           f"{_failed_path(rc, input_path, label_path)}")
    return inp, lab

"""ctypes bindings for the native JPEG decode/staging module.

Builds ``native/fastimage.cpp`` on first use (g++ -O3 -ljpeg) and caches
the shared object under the package build dir. Falls back cleanly when
libjpeg or a compiler is unavailable — callers check ``available()`` and
use the PIL path otherwise (data/dataset.py).

The C call is made with the GIL released (ctypes default), so the loader's
thread pool decodes in parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "..", "native",
    "fastimage.cpp",
)
_BUILD_DIR = os.path.expanduser("~/.cache/mamba_clip_tpu")
_SO = os.path.join(_BUILD_DIR, "libfastimage.so")


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-ljpeg",
           "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.fastimage_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.fastimage_decode_resize.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize(jpeg_bytes: bytes, side: int) -> Optional[np.ndarray]:
    """JPEG bytes → (side, side, 3) uint8 staging square, or None on
    failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((side, side, 3), np.uint8)
    rc = lib.fastimage_decode_resize(
        jpeg_bytes, len(jpeg_bytes), side,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out

"""Native (C++) host-side components, loaded via ctypes.

Auto-builds libimage_ops.so from source on first import when a compiler
is available; all callers degrade to numpy fallbacks when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libimage_ops.so")
_SRC = os.path.join(_DIR, "src", "image_ops.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The image-ops shared library, or None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.assemble_batch.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib

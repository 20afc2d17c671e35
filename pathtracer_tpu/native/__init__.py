"""Native (C++) host components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host runtime around it (the
startup-hot geometry preparation) is native C++ here, compiled on demand
with the system toolchain and cached next to the sources. Everything has a
pure-Python fallback — set ``PT_TPU_NO_NATIVE=1`` to force it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "_libptnative.so")
_SOURCES = ["bvh_builder.cpp", "obj_parser.cpp"]

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    srcs = [
        os.path.join(_DIR, s) for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))
    ]
    if not srcs:
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, *srcs,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain missing/failed -> Python fallback
        print(f"[pathtracer_tpu.native] build failed, using Python fallback: {e}",
              file=sys.stderr)
        return False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_DIR, s)) > lib_mtime
        for s in _SOURCES
        if os.path.exists(os.path.join(_DIR, s))
    )


def get_lib():
    """The loaded native library, or None (fallbacks engage)."""
    global _lib, _tried
    if os.environ.get("PT_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if _stale() and not _compile():
            return None
        try:
            _lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            print(f"[pathtracer_tpu.native] load failed: {e}", file=sys.stderr)
            _lib = None
        return _lib

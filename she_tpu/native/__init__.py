"""Native (C) components, built on demand with the system toolchain."""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libshe_tpu_native.so")
_SRC = os.path.join(_DIR, "zeroize.c")

_lib = None


def _build():
    subprocess.run(
        ["cc", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library; None if no toolchain."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.she_tpu_zeroize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
        lib.she_tpu_zeroize.restype = None
        _lib = lib
    except Exception:
        _lib = False
    return _lib or None

"""Secret zeroization (reference Zeroization.swift:1-40 + CUtil/zeroize.c).

Uses the native barrier-protected memset when the toolchain is available,
falling back to ctypes.memset. Applies to mutable host buffers (bytearray,
writable numpy arrays). Device (jax) arrays are immutable; scrubbing those
means dropping the reference and letting the runtime free the buffer —
callers should keep secrets host-side when zeroization matters.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_lib


def zeroize(buf) -> None:
    """Overwrite a mutable buffer with zeros."""
    if isinstance(buf, bytearray):
        addr = ctypes.addressof((ctypes.c_char * len(buf)).from_buffer(buf))
        size = len(buf)
    elif isinstance(buf, np.ndarray):
        if not buf.flags.writeable or not buf.flags.c_contiguous:
            raise ValueError("can only zeroize writable contiguous arrays")
        addr = buf.ctypes.data
        size = buf.nbytes
    else:
        raise TypeError(f"cannot zeroize {type(buf)}")
    lib = get_lib()
    if lib is not None:
        lib.she_tpu_zeroize(addr, size)
    else:
        ctypes.memset(addr, 0, size)

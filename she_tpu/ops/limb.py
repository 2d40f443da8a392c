"""uint32 limb arithmetic primitives for TPU.

TPU vector units have no 64-bit integer lanes, so all wide arithmetic is
built from uint32 ops: a 64-bit value is an (lo, hi) pair of uint32 arrays,
a 128-bit value a 4-tuple. Multiplication uses 16-bit half-word splits
(4 partial products + carry recombination) — the TPU-native replacement for
the reference's native 64/128-bit scalar ops
(reference: Sources/ModularArithmetic/DoubleWidthUInt.swift, Modulus.swift).

All functions are shape-polymorphic and element-wise; they trace cleanly
under jit on both CPU and TPU backends.
"""

from __future__ import annotations

import jax.numpy as jnp

M16 = 0xFFFF
U32 = jnp.uint32


def u32(x):
    return jnp.asarray(x, dtype=U32)


def mul32(a, b):
    """Full 32x32 -> 64-bit product as (lo, hi) uint32 pair."""
    a = u32(a)
    b = u32(b)
    a0 = a & M16
    a1 = a >> 16
    b0 = b & M16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # carry recombination: each sum below stays < 2^32
    mid = hl + (ll >> 16)
    mid2 = lh + (mid & M16)
    hi = hh + (mid >> 16) + (mid2 >> 16)
    lo = a * b  # wrapping low half
    return lo, hi


def mulhi32(a, b):
    return mul32(a, b)[1]


def addc32(a, b):
    """a + b -> (sum, carry) with carry in {0, 1}."""
    s = u32(a) + u32(b)
    return s, (s < u32(a)).astype(U32)


def subb32(a, b):
    """a - b -> (diff, borrow) with borrow in {0, 1}."""
    a = u32(a)
    d = a - u32(b)
    return d, (d > a).astype(U32)


# ---------------------------------------------------------------------------
# 64-bit pairs: value = lo + hi * 2^32, each a uint32 array
# ---------------------------------------------------------------------------


def add64(x, y):
    """(lo, hi) + (lo, hi), wrapping mod 2^64."""
    lo, c = addc32(x[0], y[0])
    return lo, x[1] + y[1] + c


def add64_carry(x, y):
    """64-bit add returning (lo, hi, carry_out)."""
    lo, c0 = addc32(x[0], y[0])
    hi1, c1 = addc32(x[1], y[1])
    hi, c2 = addc32(hi1, c0)
    return lo, hi, c1 + c2


def sub64(x, y):
    """(lo, hi) - (lo, hi), wrapping mod 2^64."""
    lo, b = subb32(x[0], y[0])
    return lo, x[1] - y[1] - b


def sub64_borrow(x, y):
    lo, b0 = subb32(x[0], y[0])
    hi1, b1 = subb32(x[1], y[1])
    hi, b2 = subb32(hi1, b0)
    return lo, hi, b1 + b2


def lt64(x, y):
    """Unsigned x < y for 64-bit pairs, boolean array."""
    return (x[1] < y[1]) | ((x[1] == y[1]) & (x[0] < y[0]))


def ge64(x, y):
    return ~lt64(x, y)


def eq64(x, y):
    return (x[0] == y[0]) & (x[1] == y[1])


def select64(pred, x, y):
    """where(pred, x, y) on 64-bit pairs."""
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


def mul64(x, y):
    """Full 64x64 -> 128-bit product as 4-tuple (p0, p1, p2, p3) of uint32,
    value = p0 + p1*2^32 + p2*2^64 + p3*2^96."""
    x0, x1 = x
    y0, y1 = y
    ll_lo, ll_hi = mul32(x0, y0)  # 2^0
    lh_lo, lh_hi = mul32(x0, y1)  # 2^32
    hl_lo, hl_hi = mul32(x1, y0)  # 2^32
    hh_lo, hh_hi = mul32(x1, y1)  # 2^64

    p0 = ll_lo
    p1, c1 = addc32(ll_hi, lh_lo)
    p1, c2 = addc32(p1, hl_lo)
    p2, c3 = addc32(hh_lo, lh_hi)
    p2, c4 = addc32(p2, hl_hi)
    p2, c5 = addc32(p2, c1 + c2)
    p3 = hh_hi + c3 + c4 + c5
    return p0, p1, p2, p3


def mullo64(x, y):
    """Low 64 bits of 64x64 product as (lo, hi) pair."""
    x0, x1 = x
    y0, y1 = y
    lo, hi = mul32(x0, y0)
    hi = hi + x0 * y1 + x1 * y0  # wrapping
    return lo, hi


def mulhi64(x, y):
    """High 64 bits of 64x64 product as (lo, hi) pair."""
    p = mul64(x, y)
    return p[2], p[3]


def add128(x, y):
    """4-limb + 4-limb, wrapping mod 2^128."""
    p0, c0 = addc32(x[0], y[0])
    p1a, c1 = addc32(x[1], y[1])
    p1, c1b = addc32(p1a, c0)
    p2a, c2 = addc32(x[2], y[2])
    p2, c2b = addc32(p2a, c1 + c1b)
    p3 = x[3] + y[3] + c2 + c2b
    return p0, p1, p2, p3


def shr128(p, s: int):
    """(p0..p3) >> s for static 0 < s < 64, result as 64-bit pair.

    Caller guarantees the shifted result fits in 64 bits.
    """
    assert 0 < s < 64
    p0, p1, p2, p3 = p
    if s < 32:
        lo = (p0 >> s) | (p1 << (32 - s))
        hi = (p1 >> s) | (p2 << (32 - s))
        return u32(lo), u32(hi)
    if s == 32:
        return p1, p2
    s -= 32
    lo = (p1 >> s) | (p2 << (32 - s))
    hi = (p2 >> s) | (p3 << (32 - s))
    return u32(lo), u32(hi)


def shr64(x, s: int):
    """64-bit pair >> s for static 0 <= s < 64."""
    if s == 0:
        return x
    lo, hi = x
    if s < 32:
        return u32((lo >> s) | (hi << (32 - s))), u32(hi >> s)
    if s == 32:
        return hi, jnp.zeros_like(hi)
    return u32(hi >> (s - 32)), jnp.zeros_like(hi)


def to_u64_pair(v, like=None):
    """Python int or numpy array of ints -> (lo, hi) uint32 arrays/scalars."""
    import numpy as np

    arr = np.asarray(v, dtype=object)
    lo = (arr & 0xFFFFFFFF).astype(np.uint32)
    hi = (arr >> 32).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)

"""Modular arithmetic over uint32 limb tuples ("words").

A *word* is a tuple of uint32 arrays: 1 limb for moduli < 2^30 (the fast
path, matching the reference's Bfv<UInt32> whose max modulus is 2^30-1),
2 limbs for moduli < 2^62 (Bfv<UInt64>). All ops are element-wise and
shape-polymorphic; per-RNS-row constants broadcast as [L, 1] against
[L, N] data.

Algorithms:
* Shoup multiply-by-constant with precomputed floor(w<<bits / q), lazy
  result in [0, 2q) (reference: Sources/ModularArithmetic/Modulus.swift:377-443).
* Barrett reduction of full products with mu = floor(2^2k / q), k = bitlen(q)
  (Modulus.swift:169-374). Valid for inputs < 2^2k, k >= 2.
* Exact reduction of arbitrary-width values by base-2^32 limb folding with a
  Shoup-multiplied (2^32 mod q) constant.

Host-side constant precomputation (suffix `_consts`) uses Python big ints.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import limb
from .limb import (
    add64,
    lt64,
    mul32,
    mul64,
    mulhi64,
    mullo64,
    select64,
    shr128,
    sub64,
    u32,
)

Word = tuple  # tuple of uint32 arrays, little-endian limbs


def nlimbs_for_modulus(q: int) -> int:
    return 1 if q < (1 << 30) else 2


def pack(values, n_limbs: int) -> np.ndarray:
    """numpy object array of ints -> uint32 array with leading limb axis."""
    arr = np.asarray(values, dtype=object)
    out = np.zeros((n_limbs,) + arr.shape, dtype=np.uint32)
    for i in range(n_limbs):
        if arr.size:
            out[i] = ((arr >> (32 * i)) & 0xFFFFFFFF).astype(np.uint32)
    return out


def unpack(data) -> np.ndarray:
    """uint32 array [W, ...] -> numpy object array of Python ints."""
    data = np.asarray(data)
    out = np.zeros(data.shape[1:], dtype=object)
    for i in range(data.shape[0]):
        out += data[i].astype(object) << (32 * i)
    return out


def as_word(data) -> Word:
    """[W, ...] array -> tuple of W arrays."""
    return tuple(data[i] for i in range(data.shape[0]))


def from_word(w: Word):
    return jnp.stack(w)


def umin(a, b):
    """Unsigned element-wise min as compare+select (Mosaic cannot legalize
    vector `arith.minui`, so jnp.minimum is off-limits in Pallas kernels)."""
    return jnp.where(a < b, a, b)


def _min64(x, y):
    return select64(lt64(x, y), x, y)


# ---------------------------------------------------------------------------
# 1-limb path (q < 2^30)
# ---------------------------------------------------------------------------


class W32:
    nlimbs = 1
    bits = 32

    @staticmethod
    def add_mod(x, y, q):
        (x,), (y,), (q,) = x, y, q
        s = x + y
        return (umin(s, s - q),)

    @staticmethod
    def sub_mod(x, y, q):
        (x,), (y,), (q,) = x, y, q
        d = x - y
        return (umin(d, d + q),)

    @staticmethod
    def neg_mod(x, q):
        (x,), (q,) = x, q
        return (jnp.where(x == 0, x, q - x),)

    @staticmethod
    def reduce_2q(x, q):
        (x,), (q,) = x, q
        return (umin(x, x - q),)

    @staticmethod
    def reduce_4q(x, q):
        (x,), (q,) = x, q
        x = umin(x, x - (q << 1))
        return (umin(x, x - q),)

    # lazy-range helpers used by the NTT (raw arrays, not words)
    @staticmethod
    def add_lazy(x, y):
        (x,), (y,) = x, y
        return (x + y,)

    @staticmethod
    def mul_shoup_lazy(x, w, w_shoup, q):
        """w * x mod q in [0, 2q); w < q constant with Shoup precompute.
        Exact for any x (arithmetic is mod 2^32)."""
        (x,), (w,), (ws,), (q,) = x, w, w_shoup, q
        hi = limb.mulhi32(x, ws)
        return (w * x - hi * q,)

    @classmethod
    def mul_shoup(cls, x, w, w_shoup, q):
        return cls.reduce_2q(cls.mul_shoup_lazy(x, w, w_shoup, q), q)

    @staticmethod
    def mulmod(a, b, q, k: int, mu):
        """a * b mod q fully reduced; requires a*b < 2^2k, 2 <= k <= 30,
        mu = floor(2^2k / q)."""
        assert 2 <= k <= 30
        (a,), (b,), (q,), (mu,) = a, b, q, mu
        plo, phi = mul32(a, b)
        t = u32((plo >> (k - 1)) | (phi << (32 - (k - 1))))
        ulo, uhi = mul32(t, mu)
        uu = u32((ulo >> (k + 1)) | (uhi << (32 - (k + 1))))
        r = plo - uu * q
        r = umin(r, r - q)
        r = umin(r, r - q)
        return (r,)

    @staticmethod
    def div_floor(plo, phi, q, k: int, mu):
        """Exact (quot, rem) of a 64-bit value (plo, phi) < 2^2k divided by q;
        Barrett quotient + corrections. quot must fit in uint32."""
        assert 2 <= k <= 30
        (q,), (mu,) = q, mu
        t = u32((plo >> (k - 1)) | (phi << (32 - (k - 1))))
        ulo, uhi = mul32(t, mu)
        uu = u32((ulo >> (k + 1)) | (uhi << (32 - (k + 1))))
        r = plo - uu * q
        c1 = (r >= q).astype(jnp.uint32)
        r = r - c1 * q
        uu = uu + c1
        c2 = (r >= q).astype(jnp.uint32)
        r = r - c2 * q
        uu = uu + c2
        return (uu,), (r,)

    @staticmethod
    def reduce_u32(x, q, mu32):
        """Arbitrary uint32 -> [0, q); mu32 = floor(2^32 / q)."""
        (x,), (q,), (mu32,) = x, q, mu32
        hi = limb.mulhi32(x, mu32)
        r = x - hi * q
        r = umin(r, r - q)
        r = umin(r, r - q)
        return (r,)

    @classmethod
    def reduce_u64(cls, lo, hi, q, consts):
        """Exact (hi*2^32 + lo) mod q for arbitrary uint32 hi, lo arrays.
        consts["mu32"] is a raw uint32 scalar."""
        mu = (consts["mu32"],)
        hi_mod = cls.reduce_u32((hi,), q, mu)
        lo_mod = cls.reduce_u32((lo,), q, mu)
        term = cls.mul_shoup(hi_mod, consts["r32"], consts["r32_shoup"], q)
        return cls.add_mod(term, lo_mod, q)


# ---------------------------------------------------------------------------
# 2-limb path (q < 2^62)
# ---------------------------------------------------------------------------


class W64:
    nlimbs = 2
    bits = 64

    @staticmethod
    def add_mod(x, y, q):
        s = add64(x, y)
        return _min64(s, sub64(s, q))

    @staticmethod
    def sub_mod(x, y, q):
        d = sub64(x, y)
        return _min64(d, add64(d, q))

    @staticmethod
    def neg_mod(x, q):
        z = (x[0] == 0) & (x[1] == 0)
        r = sub64(q, x)
        return jnp.where(z, x[0], r[0]), jnp.where(z, x[1], r[1])

    @staticmethod
    def reduce_2q(x, q):
        return _min64(x, sub64(x, q))

    @staticmethod
    def reduce_4q(x, q):
        q2 = add64(q, q)
        x = _min64(x, sub64(x, q2))
        return _min64(x, sub64(x, q))

    @staticmethod
    def add_lazy(x, y):
        return add64(x, y)

    @staticmethod
    def mul_shoup_lazy(x, w, w_shoup, q):
        hi = mulhi64(x, w_shoup)
        return sub64(mullo64(x, w), mullo64(hi, q))

    @classmethod
    def mul_shoup(cls, x, w, w_shoup, q):
        return cls.reduce_2q(cls.mul_shoup_lazy(x, w, w_shoup, q), q)

    @staticmethod
    def _barrett_2k(p, q, k: int, mu):
        """p (4-limb, < 2^2k) mod q, k >= 2; mu 64-bit pair."""
        t = shr128(p, k - 1) if k > 1 else (p[0], p[1])
        tu = mul64(t, mu)
        uu = shr128(tu, k + 1)
        r = sub64((p[0], p[1]), mullo64(uu, q))
        r = _min64(r, sub64(r, q))
        r = _min64(r, sub64(r, q))
        return r

    @classmethod
    def mulmod(cls, a, b, q, k: int, mu):
        """a * b mod q for a, b in [0, q), fully reduced."""
        return cls._barrett_2k(mul64(a, b), q, k, mu)

    @staticmethod
    def div_floor(p, q, k: int, mu):
        """Exact (quot, rem) of 4-limb p < 2^2k divided by q (64-bit pair)."""
        t = shr128(p, k - 1) if k > 1 else (p[0], p[1])
        tu = mul64(t, mu)
        uu = shr128(tu, k + 1)
        r = sub64((p[0], p[1]), mullo64(uu, q))
        one = (jnp.ones_like(r[0]), jnp.zeros_like(r[0]))
        for _ in range(2):
            ge = ~lt64(r, q)
            r = select64(ge, sub64(r, q), r)
            uu = select64(ge, add64(uu, one), uu)
        return uu, r

    @classmethod
    def _reduce_limb(cls, v, q, consts):
        """Arbitrary uint32 array -> word in [0, q)."""
        k = consts["k"]
        z = jnp.zeros_like(v)
        if k >= 32:
            # q >= 2^31 => v < 2^32 <= 2q: one conditional subtract
            x = (v, z)
            return _min64(x, sub64(x, q))
        ql = q[0]
        if k == 31:
            # q in [2^30, 2^31): v < 2^32 < 4q
            r = umin(v, v - (ql << 1))
            r = umin(r, r - ql)
            return (r, z)
        r = W32.reduce_u32((v,), (ql,), (consts["mu32"],))
        return (r[0], z)

    @classmethod
    def reduce_u128(cls, p, q, consts):
        """Exact 128-bit (4-limb) value mod q, any k: base-2^32 limb fold.

        acc = ((((p3 mod q)*2^32 + p2)...)*2^32 + p0) mod q, with the *2^32
        step as a Shoup multiply by r32 = 2^32 mod q.
        """
        r32, r32s = consts["r32"], consts["r32_shoup"]
        acc = cls._reduce_limb(p[3], q, consts)
        for i in (2, 1, 0):
            acc = cls.mul_shoup(acc, r32, r32s, q)
            acc = cls.add_mod(acc, cls._reduce_limb(p[i], q, consts), q)
        return acc

    @classmethod
    def reduce_u64_any(cls, x, q, consts):
        """Arbitrary 64-bit pair -> [0, q)."""
        k, mu = consts["k"], consts["mu"]
        if k >= 32:
            z = jnp.zeros_like(x[0])
            return cls._barrett_2k((x[0], x[1], z, z), q, k, mu)
        r32, r32s = consts["r32"], consts["r32_shoup"]
        acc = cls._reduce_limb(x[1], q, consts)
        acc = cls.mul_shoup(acc, r32, r32s, q)
        return cls.add_mod(acc, cls._reduce_limb(x[0], q, consts), q)


# ---------------------------------------------------------------------------
# Host-side constant precomputation (Python ints)
# ---------------------------------------------------------------------------


def shoup_const(w: int, q: int, bits: int) -> int:
    """floor(w << bits / q); requires w < q."""
    assert 0 <= w < q
    return (w << bits) // q


def barrett_mu(q: int) -> tuple[int, int]:
    """(k, mu) for 2k-bit Barrett: k = bitlen(q), mu = floor(2^2k / q)."""
    k = q.bit_length()
    return k, (1 << (2 * k)) // q


def row_consts(q: int, bits: int) -> dict:
    """All per-modulus constants as Python ints; bits in {32, 64}."""
    k, mu = barrett_mu(q)
    c = {"q": q, "k": k, "mu": mu}
    c["mu32"] = (1 << 32) // q
    c["r32"] = (1 << 32) % q
    c["r32_shoup"] = shoup_const(c["r32"], q, bits)
    if bits == 64:
        c["r64"] = (1 << 64) % q
        c["r64_shoup"] = shoup_const(c["r64"], q, 64)
    return c

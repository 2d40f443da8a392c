"""Limb/word modular arithmetic vs Python big-int ground truth.

Analogue of the reference's ScalarTests/DoubleWidthUIntTests (exhaustive
Barrett/Shoup semantics), run over randomized + adversarial edge inputs.
"""

import numpy as np
import pytest

from she_tpu.ops import limb, word
from she_tpu.ops.word import W32, W64

RNG = np.random.default_rng(12345)

W32_MODULI = [3, 11, 17, 37, 4099, 40961, 65537, (1 << 27) - 40959, (1 << 28) - 65535, (1 << 30) - 35839]
W64_MODULI = [
    3,
    17,
    40961,
    65537,
    (1 << 29) + 32769,
    (1 << 30) - 35839,
    (1 << 33) - 81919,
    (1 << 41) + 32769,
    (1 << 55) - 311295,
    (1 << 60) - 16383,
    (1 << 62) - 40797,  # gamma64: largest legal magnitude
]


def rand_residues(q, n=256):
    lo = RNG.integers(0, 1 << 32, size=n, dtype=np.uint64)
    hi = RNG.integers(0, 1 << 32, size=n, dtype=np.uint64)
    vals = (hi.astype(object) << 32) + lo.astype(object)
    vals = vals % q
    # adversarial edges
    for i, v in enumerate([0, 1, q - 1, q // 2, q // 2 + 1]):
        if i < n:
            vals[i] = v
    return vals


def to_word(vals, nl):
    return word.as_word(word.pack(vals, nl))


def from_word(w):
    return word.unpack(np.stack([np.asarray(x) for x in w]))


def test_mul32():
    a = RNG.integers(0, 1 << 32, size=512, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=512, dtype=np.uint64).astype(np.uint32)
    a[:4] = [0, 0xFFFFFFFF, 0xFFFFFFFF, 1]
    b[:4] = [0, 0xFFFFFFFF, 1, 0xFFFFFFFF]
    lo, hi = limb.mul32(a, b)
    expect = a.astype(object) * b.astype(object)
    got = (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)
    assert (got == expect).all()


def test_mul64():
    a = (RNG.integers(0, 1 << 62, size=256).astype(object) * 7) % (1 << 64)
    b = (RNG.integers(0, 1 << 62, size=256).astype(object) * 11) % (1 << 64)
    a[:3] = [0, (1 << 64) - 1, (1 << 64) - 1]
    b[:3] = [(1 << 64) - 1, (1 << 64) - 1, 1]
    aw = to_word(a, 2)
    bw = to_word(b, 2)
    p = limb.mul64(aw, bw)
    got = sum(np.asarray(p[i]).astype(object) << (32 * i) for i in range(4))
    assert (got == a * b).all()


@pytest.mark.parametrize("q", W32_MODULI)
def test_w32_addsub(q):
    a = rand_residues(q)
    b = rand_residues(q)
    aw, bw = to_word(a, 1), to_word(b, 1)
    qw = to_word(np.array([q] * len(a), dtype=object), 1)
    assert (from_word(W32.add_mod(aw, bw, qw)) == (a + b) % q).all()
    assert (from_word(W32.sub_mod(aw, bw, qw)) == (a - b) % q).all()
    assert (from_word(W32.neg_mod(aw, qw)) == (q - a) % q).all()


@pytest.mark.parametrize("q", [x for x in W32_MODULI if x >= 3])
def test_w32_mulmod(q):
    a = rand_residues(q)
    b = rand_residues(q)
    aw, bw = to_word(a, 1), to_word(b, 1)
    k, mu = word.barrett_mu(q)
    qw = to_word(np.array([q] * len(a), dtype=object), 1)
    muw = to_word(np.array([mu] * len(a), dtype=object), 1)
    got = from_word(W32.mulmod(aw, bw, qw, k, muw))
    assert (got == (a * b) % q).all()


@pytest.mark.parametrize("q", W32_MODULI)
def test_w32_shoup(q):
    x = rand_residues(q)
    # fixed multiplier, also test w = 0, 1, q-1
    for wconst in [0, 1, q - 1, int(x[5] if len(x) > 5 else 1) % q]:
        ws = word.shoup_const(wconst, q, 32)
        xw = to_word(x, 1)
        qw = to_word(np.array([q] * len(x), dtype=object), 1)
        wcw = to_word(np.array([wconst] * len(x), dtype=object), 1)
        wsw = to_word(np.array([ws] * len(x), dtype=object), 1)
        lazy = from_word(W32.mul_shoup_lazy(xw, wcw, wsw, qw))
        assert (lazy % q == (wconst * x) % q).all()
        assert (lazy < 2 * q).all()
        full = from_word(W32.mul_shoup(xw, wcw, wsw, qw))
        assert (full == (wconst * x) % q).all()


@pytest.mark.parametrize("q", [x for x in W32_MODULI if x < (1 << 30)])
def test_w32_reduce_u64(q):
    c = word.row_consts(q, 32)
    lo = RNG.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    hi = RNG.integers(0, 1 << 32, size=256, dtype=np.uint64).astype(np.uint32)
    lo[:2] = [0xFFFFFFFF, 0]
    hi[:2] = [0xFFFFFFFF, 0]
    cw = {
        "mu32": np.uint32(c["mu32"]),
        "r32": (np.uint32(c["r32"]),),
        "r32_shoup": (np.uint32(c["r32_shoup"]),),
    }
    qw = (np.uint32(q),)
    got = from_word(W32.reduce_u64(lo, hi, qw, cw))
    expect = ((hi.astype(object) << 32) + lo.astype(object)) % q
    assert (got == expect).all()


@pytest.mark.parametrize("q", W64_MODULI)
def test_w64_addsub(q):
    a = rand_residues(q)
    b = rand_residues(q)
    aw, bw = to_word(a, 2), to_word(b, 2)
    qw = to_word(np.array([q] * len(a), dtype=object), 2)
    assert (from_word(W64.add_mod(aw, bw, qw)) == (a + b) % q).all()
    assert (from_word(W64.sub_mod(aw, bw, qw)) == (a - b) % q).all()
    assert (from_word(W64.neg_mod(aw, qw)) == (q - a) % q).all()


@pytest.mark.parametrize("q", W64_MODULI)
def test_w64_mulmod(q):
    a = rand_residues(q)
    b = rand_residues(q)
    aw, bw = to_word(a, 2), to_word(b, 2)
    k, mu = word.barrett_mu(q)
    qw = to_word(np.array([q] * len(a), dtype=object), 2)
    muw = to_word(np.array([mu] * len(a), dtype=object), 2)
    got = from_word(W64.mulmod(aw, bw, qw, k, muw))
    assert (got == (a * b) % q).all()


@pytest.mark.parametrize("q", W64_MODULI)
def test_w64_shoup(q):
    x = rand_residues(q)
    for wconst in [0, 1, q - 1, int(x[6]) % q]:
        ws = word.shoup_const(wconst, q, 64)
        n = len(x)
        xw = to_word(x, 2)
        qw = to_word(np.array([q] * n, dtype=object), 2)
        wcw = to_word(np.array([wconst] * n, dtype=object), 2)
        wsw = to_word(np.array([ws] * n, dtype=object), 2)
        lazy = from_word(W64.mul_shoup_lazy(xw, wcw, wsw, qw))
        assert (lazy % q == (wconst * x) % q).all()
        assert (lazy < 2 * q).all()
        full = from_word(W64.mul_shoup(xw, wcw, wsw, qw))
        assert (full == (wconst * x) % q).all()


@pytest.mark.parametrize("q", W64_MODULI)
def test_w64_reduce_u128(q):
    c = word.row_consts(q, 64)
    n = 256
    vals = np.array(
        [int.from_bytes(RNG.bytes(16), "little") for _ in range(n)], dtype=object
    )
    vals[:3] = [0, (1 << 128) - 1, q * q * 3 if q * q * 3 < (1 << 128) else 1]
    p = tuple(
        np.asarray(((vals >> (32 * i)) & 0xFFFFFFFF).astype(np.uint32)) for i in range(4)
    )
    qw = to_word(np.array([q] * n, dtype=object), 2)
    cw = {
        "k": c["k"],
        "mu": to_word(np.array([c["mu"]] * n, dtype=object), 2),
        "mu32": np.uint32(c["mu32"]),
        "r32": to_word(np.array([c["r32"]] * n, dtype=object), 2),
        "r32_shoup": to_word(np.array([c["r32_shoup"]] * n, dtype=object), 2),
    }
    got = from_word(W64.reduce_u128(p, qw, cw))
    assert (got == vals % q).all()


@pytest.mark.parametrize("q", W64_MODULI)
def test_w64_reduce_u64_any(q):
    c = word.row_consts(q, 64)
    n = 256
    vals = np.array([int.from_bytes(RNG.bytes(8), "little") for _ in range(n)], dtype=object)
    vals[:2] = [0, (1 << 64) - 1]
    x = to_word(vals, 2)
    qw = to_word(np.array([q] * n, dtype=object), 2)
    cw = {
        "k": c["k"],
        "mu": to_word(np.array([c["mu"]] * n, dtype=object), 2),
        "mu32": np.uint32(c["mu32"]),
        "r32": to_word(np.array([c["r32"]] * n, dtype=object), 2),
        "r32_shoup": to_word(np.array([c["r32_shoup"]] * n, dtype=object), 2),
    }
    got = from_word(W64.reduce_u64_any(x, qw, cw))
    assert (got == vals % q).all()

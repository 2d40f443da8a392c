"""PolyRq op tests vs big-int ground truth (analogue of PolyRqTests)."""

import numpy as np
import pytest

from she_tpu.core import poly
from she_tpu.core.context import get_poly_context
from she_tpu.utils import refimpl

RNG = np.random.default_rng(99)


def rand_poly(ctx, fmt=poly.COEFF):
    vals = np.zeros((len(ctx.moduli), ctx.degree), dtype=object)
    for i, q in enumerate(ctx.moduli):
        vals[i] = np.array([int(RNG.integers(0, min(q, 1 << 62))) % q for _ in range(ctx.degree)], dtype=object)
    return poly.PolyRq.from_values(vals, ctx, fmt), vals


CONTEXTS = [
    (64, (40961, 59393), 32),
    (64, ((1 << 28) - 65535, (1 << 27) - 40959), 32),
    (64, ((1 << 55) - 311295, (1 << 60) - 16383), 64),
    (32, (7681, 12289, 40961), 32),
]


@pytest.mark.parametrize("degree,moduli,bits", CONTEXTS)
def test_add_sub_neg(degree, moduli, bits):
    ctx = get_poly_context(degree, moduli, bits)
    a, av = rand_poly(ctx)
    b, bv = rand_poly(ctx)
    qcol = np.array(moduli, dtype=object)[:, None]
    assert (poly.add(a, b).to_values() == (av + bv) % qcol).all()
    assert (poly.sub(a, b).to_values() == (av - bv) % qcol).all()
    assert (poly.neg(a).to_values() == (-av) % qcol).all()


@pytest.mark.parametrize("degree,moduli,bits", CONTEXTS)
def test_mul_eval(degree, moduli, bits):
    ctx = get_poly_context(degree, moduli, bits)
    a, av = rand_poly(ctx, poly.EVAL)
    b, bv = rand_poly(ctx, poly.EVAL)
    qcol = np.array(moduli, dtype=object)[:, None]
    assert (poly.mul_eval(a, b).to_values() == (av * bv) % qcol).all()


@pytest.mark.parametrize("degree,moduli,bits", CONTEXTS)
def test_mul_scalar_rows(degree, moduli, bits):
    ctx = get_poly_context(degree, moduli, bits)
    a, av = rand_poly(ctx)
    consts = [int(RNG.integers(0, q)) for q in moduli]
    qcol = np.array(moduli, dtype=object)[:, None]
    ccol = np.array(consts, dtype=object)[:, None]
    assert (poly.mul_scalar_rows(a, consts).to_values() == (av * ccol) % qcol).all()


@pytest.mark.parametrize("degree,moduli,bits", CONTEXTS[:3])
def test_ntt_roundtrip_via_poly(degree, moduli, bits):
    ctx = get_poly_context(degree, moduli, bits)
    a, av = rand_poly(ctx)
    ev = poly.forward_ntt(a)
    for i, q in enumerate(moduli):
        assert list(ev.to_values()[i]) == refimpl.forward_ntt(list(av[i]), q)
    back = poly.inverse_ntt(ev)
    assert (back.to_values() == av).all()


@pytest.mark.parametrize("degree,moduli,bits", CONTEXTS)
def test_divide_and_round_q_last(degree, moduli, bits):
    ctx = get_poly_context(degree, moduli, bits)
    a, av = rand_poly(ctx)
    got = poly.divide_and_round_q_last(a)
    # ground truth: x = CRT-compose, rounded division by q_last, re-reduce
    q_last = moduli[-1]
    Q = 1
    for q in moduli:
        Q *= q
    composed = np.zeros(degree, dtype=object)
    for j in range(degree):
        x = 0
        for i, q in enumerate(moduli):
            gi = Q // q
            x += int(av[i][j]) * nt_inv(gi % q, q) * gi
        composed[j] = x % Q
    rounded = (composed + (q_last >> 1)) // q_last
    for i, q in enumerate(moduli[:-1]):
        assert (got.to_values()[i] == rounded % q).all(), f"row {i}"


def nt_inv(x, q):
    return pow(x, -1, q)


@pytest.mark.parametrize("power", [1, 3, 63, 64, 65, 127, -1, -5, -64, -130, 128, 256])
def test_multiply_power_of_x(power):
    degree = 64
    q = 40961
    ctx = get_poly_context(degree, (q,), 32)
    a, av = rand_poly(ctx)
    got = poly.multiply_power_of_x(a, power).to_values()[0]
    # ground truth via polynomial multiplication mod x^N + 1
    expect = np.zeros(degree, dtype=object)
    for i in range(degree):
        e = (i + power) % (2 * degree)
        sign = 1
        if e >= degree:
            e -= degree
            sign = -1
        expect[e] = (sign * int(av[0][i])) % q
    assert (got == expect).all()


def test_drop_context():
    ctx = get_poly_context(32, (7681, 12289, 40961), 32)
    a, av = rand_poly(ctx)
    dropped = poly.drop_context(a, ctx.get_context(2))
    assert (dropped.to_values() == av[:2]).all()

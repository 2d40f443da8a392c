"""BFV ct-ct multiply (BEHZ), relinearization, Galois rotations.

Mirrors HeApiTestUtils multiply/rotate/swapRows property tests."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.ops import galois as galoismod
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(777)

PARAM_SETS = [
    ("insecure_n_8_logq_5x18_logt_5", 32),
    ("insecure_n_8_logq_5x18_logt_5", 64),
    ("insecure_n_16_logq_60_logt_15", 64),
]


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


def make(name, bits):
    ep = paramsmod.from_predefined(name, scalar_bits=bits)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    return ctx, sk


def negacyclic_product(v1, v2, t):
    n = len(v1)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            sign = 1
            if k >= n:
                k -= n
                sign = -1
            out[k] = (out[k] + sign * v1[i] * v2[j]) % t
    return out


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_ct_mul(name, bits):
    ctx, sk = make(name, bits)
    t = ctx.plaintext_modulus
    n = ctx.degree
    v1 = [int(v) for v in RNG.integers(0, t, size=n)]
    v2 = [int(v) for v in RNG.integers(0, t, size=n)]
    ct1 = bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt(bfv.encode(ctx, v2), sk, err_rng=det_rng(b"2"))
    prod = bfv.ct_mul(ct1, ct2)
    assert len(prod.polys) == 3
    got = bfv.decode(ctx, bfv.decrypt(prod, sk))
    assert got == negacyclic_product(v1, v2, t)


@pytest.mark.parametrize("name,bits", PARAM_SETS[:2])
def test_relinearize(name, bits):
    ctx, sk = make(name, bits)
    t = ctx.plaintext_modulus
    n = ctx.degree
    ek = keys.generate_evaluation_key(
        ctx, keys.EvaluationKeyConfig(has_relinearization_key=True), sk, det_rng(b"k")
    )
    v1 = [int(v) for v in RNG.integers(0, t, size=n)]
    v2 = [int(v) for v in RNG.integers(0, t, size=n)]
    ct1 = bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt(bfv.encode(ctx, v2), sk, err_rng=det_rng(b"2"))
    prod = bfv.ct_mul_relin(ct1, ct2, ek)
    assert len(prod.polys) == 2
    got = bfv.decode(ctx, bfv.decrypt(prod, sk))
    assert got == negacyclic_product(v1, v2, t)
    assert bfv.noise_budget(prod, sk) > 0


def test_rotate_columns_and_swap_rows():
    ctx, sk = make("insecure_n_8_logq_5x18_logt_5", 32)
    t = ctx.plaintext_modulus
    n = ctx.degree
    half = n // 2
    elements = [galoismod.swapping_rows_element(n)]
    for step in range(1, half):
        elements.append(galoismod.rotating_columns_element(step, n))
        elements.append(galoismod.rotating_columns_element(-step, n))
    ek = keys.generate_evaluation_key(
        ctx, keys.EvaluationKeyConfig(galois_elements=tuple(elements)), sk, det_rng(b"k")
    )
    data = [int(v) for v in RNG.integers(0, t, size=n)]
    ct = bfv.encrypt(bfv.encode(ctx, data, fmt="simd"), sk, err_rng=det_rng(b"1"))

    for step in range(1, min(8, half)):
        rotated = bfv.rotate_columns(ct, step, ek)
        expected = (
            data[half - step : half]
            + data[: half - step]
            + data[n - step : n]
            + data[half : n - step]
        )
        assert bfv.decode(ctx, bfv.decrypt(rotated, sk), fmt="simd") == expected
        back = bfv.rotate_columns(rotated, -step, ek)
        assert bfv.decode(ctx, bfv.decrypt(back, sk), fmt="simd") == data

    swapped = bfv.swap_rows(ct, ek)
    assert bfv.decode(ctx, bfv.decrypt(swapped, sk), fmt="simd") == data[half:] + data[:half]
    assert bfv.decode(ctx, bfv.decrypt(bfv.swap_rows(swapped, ek), sk), fmt="simd") == data


@pytest.mark.parametrize("name,bits", PARAM_SETS[:2])
def test_apply_galois_coeff_identity(name, bits):
    """f(x^p) on a constant polynomial is unchanged."""
    ctx, sk = make(name, bits)
    t = ctx.plaintext_modulus
    n = ctx.degree
    element = 3
    ek = keys.generate_evaluation_key(
        ctx, keys.EvaluationKeyConfig(galois_elements=(element,)), sk, det_rng(b"k")
    )
    c = int(RNG.integers(0, t))
    vals = [c] + [0] * (n - 1)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    out = bfv.apply_galois(ct, element, ek)
    assert bfv.decode(ctx, bfv.decrypt(out, sk)) == vals


@pytest.mark.parametrize("name,bits", PARAM_SETS[:2])
def test_apply_galois_monomial(name, bits):
    """f(x) = x maps to x^p under element p."""
    ctx, sk = make(name, bits)
    t = ctx.plaintext_modulus
    n = ctx.degree
    element = 3
    ek = keys.generate_evaluation_key(
        ctx, keys.EvaluationKeyConfig(galois_elements=(element,)), sk, det_rng(b"k")
    )
    vals = [0, 1] + [0] * (n - 2)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    out = bfv.decode(ctx, bfv.decrypt(bfv.apply_galois(ct, element, ek), sk))
    expected = [0] * n
    expected[element] = 1  # x -> x^3 (3 < n here)
    assert out == expected


def test_inner_product_ct_pt():
    ctx, sk = make("insecure_n_8_logq_5x18_logt_5", 32)[0], None
    ctx, sk = make("insecure_n_8_logq_5x18_logt_5", 32)
    t = ctx.plaintext_modulus
    n = ctx.degree
    cts, pts, expect = [], [], [0] * n
    for i in range(5):
        v = [int(x) for x in RNG.integers(0, t, size=n)]
        c = int(RNG.integers(0, t))
        cvals = [c] + [0] * (n - 1)
        cts.append(
            bfv.ct_to_eval(
                bfv.encrypt(bfv.encode(ctx, v), sk, err_rng=det_rng(bytes([i])))
            )
        )
        pts.append(bfv.plaintext_to_eval(ctx, bfv.encode(ctx, cvals)))
        expect = [(e + a * c) % t for e, a in zip(expect, v)]
    # include a skipped (None) plaintext
    cts.append(cts[0])
    pts.append(None)
    out = bfv.inner_product_ct_pt(cts, pts)
    got = bfv.decode(ctx, bfv.decrypt(bfv.ct_to_coeff(out), sk))
    assert got == expect


def test_multiply_power_of_x_ct():
    ctx, sk = make("insecure_n_8_logq_5x18_logt_5", 32)
    t = ctx.plaintext_modulus
    n = ctx.degree
    vals = [int(v) for v in RNG.integers(0, t, size=n)]
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    shifted = bfv.multiply_power_of_x(ct, 3)
    got = bfv.decode(ctx, bfv.decrypt(shifted, sk))
    expected = [0] * n
    for i, v in enumerate(vals):
        k = i + 3
        sign = 1
        if k >= n:
            k -= n
            sign = -1
        expected[k] = (sign * v) % t
    assert got == expected

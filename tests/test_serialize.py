"""Serialization tests: coefficient-packing KATs from the reference
(Tests/HomomorphicEncryptionTests/CoefficientPackingTests.swift:85-210),
poly/ciphertext/key round trips, seeded ciphertexts, skipLSBs."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.core.poly import COEFF, EVAL
from she_tpu.io import serialize as ser
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(55)

B2C_KATS = [
    ([3, 24, 95, 141, 179, 34, 113], 4, 0, False, [0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1]),
    ([3, 24, 95, 141, 179, 34, 113], 4, 0, True, [0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1]),
    ([4, 69, 230, 164, 150, 0], 4, 1, True, [0, 2, 0, 8, 4, 14, 8, 12, 10, 2, 2, 2, 6, 0, 0, 0]),
    ([2, 123, 128, 64], 4, 2, False, [0, 0, 0, 8, 4, 12, 8, 12, 8, 0, 0, 0, 4, 0, 0, 0]),
    ([2, 123, 128, 64], 4, 2, True, [0, 0, 0, 8, 4, 12, 8, 12, 8, 0, 0, 0, 4, 0, 0, 0]),
    ([23, 128], 4, 3, True, [0, 0, 0, 8, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0]),
    (list(range(256)), 8, 0, False, list(range(256))),
]

C2B_KATS = [
    ([0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1], 4, 0, [3, 24, 95, 141, 179, 34, 113]),
    ([0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1], 4, 1, [4, 69, 230, 164, 150, 0]),
    ([0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1], 4, 2, [2, 123, 128, 64]),
    ([0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1], 4, 3, [23, 128]),
    ([0, 3, 1, 8, 5, 15, 8, 13, 11, 3, 2, 2, 7, 1], 5, 0, [0, 194, 130, 189, 13, 88, 196, 35, 132]),
    ([19, 16, 21, 4, 0, 1, 15, 3, 10, 3], 5, 1, [152, 162, 0, 113, 81]),
    ([19, 16, 21, 4, 0, 1, 15, 3, 10, 3], 5, 2, [146, 144, 24, 64]),
    (list(range(256)), 8, 0, list(range(256))),
]


@pytest.mark.parametrize("idx", range(len(B2C_KATS)))
def test_bytes_to_coefficients_kat(idx):
    data, bits, skip, decode, expected = B2C_KATS[idx]
    got = ser.bytes_to_coefficients(bytes(data), bits, decode, skip)
    assert [int(v) for v in got] == expected


@pytest.mark.parametrize("idx", range(len(C2B_KATS)))
def test_coefficients_to_bytes_kat(idx):
    coeffs, bits, skip, expected = C2B_KATS[idx]
    got = ser.coefficients_to_bytes(coeffs, bits, skip)
    assert list(got) == expected


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def setup():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    return ctx, sk


def test_poly_roundtrip(setup):
    ctx, sk = setup
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    pt = bfv.encode(ctx, vals)
    data = ser.serialize_plaintext(pt)
    pt2 = ser.deserialize_plaintext(data, ctx)
    assert bfv.decode(ctx, pt2) == vals


def test_ciphertext_full_roundtrip(setup):
    ctx, sk = setup
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    ct.seed = None  # force full serialization
    s = ser.serialize_ciphertext(ct)
    assert s.kind == "full"
    ct2 = ser.deserialize_ciphertext(s, ctx, COEFF)
    assert bfv.decode(ctx, bfv.decrypt(ct2, sk)) == vals


def test_ciphertext_seeded_roundtrip(setup):
    ctx, sk = setup
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    seed = bytes(range(32))
    ct = bfv.encrypt_zero(ctx, sk, seed=seed, err_rng=det_rng(b"1"))
    s = ser.serialize_ciphertext(ct)
    assert s.kind == "seeded"
    assert s.seed == seed
    ct2 = ser.deserialize_ciphertext(s, ctx, COEFF)
    # the re-expanded `a` must match bit-for-bit
    assert (np.asarray(ct2.polys[1].data) == np.asarray(ct.polys[1].data)).all()
    dec = bfv.decode(ctx, bfv.decrypt(ct2, sk))
    assert dec == [0] * ctx.degree


def test_ciphertext_skip_lsbs_decrypt(setup):
    ctx, sk = setup
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    single = bfv.mod_switch_down_to_single(ct)
    single.seed = None
    s = ser.serialize_ciphertext(single, for_decryption=True)
    assert any(x > 0 for x in s.skip_lsbs)
    ct2 = ser.deserialize_ciphertext(s, ctx, COEFF, moduli_count=1)
    assert bfv.decode(ctx, bfv.decrypt(ct2, sk)) == vals


def test_ciphertext_indices_masking(setup):
    ctx, sk = setup
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    ct.seed = None
    s = ser.serialize_ciphertext(ct, indices=[0, 3])
    ct2 = ser.deserialize_ciphertext(s, ctx, COEFF)
    dec = bfv.decode(ctx, bfv.decrypt(ct2, sk))
    assert dec[0] == vals[0] and dec[3] == vals[3]


def test_secret_key_roundtrip(setup):
    ctx, sk = setup
    data = ser.serialize_secret_key(sk)
    sk2 = ser.deserialize_secret_key(data, ctx)
    assert (np.asarray(sk2.poly.data) == np.asarray(sk.poly.data)).all()


def test_evaluation_key_roundtrip(setup):
    ctx, sk = setup
    ek = keys.generate_evaluation_key(
        ctx,
        keys.EvaluationKeyConfig(galois_elements=(3,), has_relinearization_key=True),
        sk,
        det_rng(b"k"),
    )
    s = ser.serialize_evaluation_key(ek)
    ek2 = ser.deserialize_evaluation_key(s, ctx)
    vals = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    v2 = [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    ct1 = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt(bfv.encode(ctx, v2), sk, err_rng=det_rng(b"2"))
    t = ctx.plaintext_modulus
    prod = bfv.ct_mul_relin(ct1, ct2, ek2)
    from tests.test_bfv_mul import negacyclic_product

    assert bfv.decode(ctx, bfv.decrypt(prod, sk)) == negacyclic_product(vals, v2, t)
    out = bfv.apply_galois(ct1, 3, ek2)
    assert bfv.decrypt(out, sk) is not None

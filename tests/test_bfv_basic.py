"""BFV end-to-end basics: the analogue of HeAPITests encrypt/decrypt/add
property tests (Tests/HomomorphicEncryptionTests/HeAPITests.swift via
_TestUtilities/HeApiTestUtils.swift)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(2024)

PARAM_SETS = [
    ("insecure_n_8_logq_5x18_logt_5", 32),
    ("insecure_n_8_logq_5x18_logt_5", 64),
    ("insecure_n_16_logq_60_logt_15", 64),
    ("insecure_n_512_logq_4x60_logt_20", 64),
]


def make_ctx(name, bits):
    ep = paramsmod.from_predefined(name, scalar_bits=bits)
    return bfv.get_bfv_context(ep)


def rand_values(ctx, count=None):
    t = ctx.plaintext_modulus
    n = count if count is not None else ctx.degree
    return [int(v) for v in RNG.integers(0, t, size=n)]


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_encode_decode_coefficient(name, bits):
    ctx = make_ctx(name, bits)
    vals = rand_values(ctx)
    pt = bfv.encode(ctx, vals)
    assert bfv.decode(ctx, pt) == vals


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_encode_decode_signed(name, bits):
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    lo, hi = -(t >> 1), (t - 1) >> 1
    vals = [int(v) for v in RNG.integers(lo, hi + 1, size=ctx.degree)]
    pt = bfv.encode_signed(ctx, vals)
    assert bfv.decode_signed(ctx, pt) == vals


def test_encode_decode_simd():
    ctx = make_ctx("insecure_n_16_logq_60_logt_15", 64)  # t = 16417 = 1 mod 32
    assert ctx.supports_simd_encoding
    vals = rand_values(ctx)
    pt = bfv.encode(ctx, vals, fmt="simd")
    assert bfv.decode(ctx, pt, fmt="simd") == vals


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_encrypt_decrypt(name, bits):
    ctx = make_ctx(name, bits)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    vals = rand_values(ctx)
    pt = bfv.encode(ctx, vals)
    ct = bfv.encrypt(pt, sk, err_rng=det_rng(b"e"))
    assert not bfv.is_transparent(ct)
    dec = bfv.decrypt(ct, sk)
    assert bfv.decode(ctx, dec) == vals
    assert bfv.noise_budget(ct, sk) > 0


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_ct_add_sub_neg(name, bits):
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    v1, v2 = rand_values(ctx), rand_values(ctx)
    ct1 = bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt(bfv.encode(ctx, v2), sk, err_rng=det_rng(b"2"))
    s = bfv.decode(ctx, bfv.decrypt(bfv.ct_add(ct1, ct2), sk))
    assert s == [(a + b) % t for a, b in zip(v1, v2)]
    d = bfv.decode(ctx, bfv.decrypt(bfv.ct_sub(ct1, ct2), sk))
    assert d == [(a - b) % t for a, b in zip(v1, v2)]
    n = bfv.decode(ctx, bfv.decrypt(bfv.ct_neg(ct1), sk))
    assert n == [(-a) % t for a in v1]


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_ct_plaintext_add_sub(name, bits):
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    v1, v2 = rand_values(ctx), rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1"))
    pt2 = bfv.encode(ctx, v2)
    s = bfv.decode(ctx, bfv.decrypt(bfv.ct_add_pt(ct, pt2), sk))
    assert s == [(a + b) % t for a, b in zip(v1, v2)]
    d = bfv.decode(ctx, bfv.decrypt(bfv.ct_sub_pt(ct, pt2), sk))
    assert d == [(a - b) % t for a, b in zip(v1, v2)]


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_ct_mul_pt_eval(name, bits):
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    v1, v2 = rand_values(ctx), rand_values(ctx)
    # coefficient-encoded: product is negacyclic convolution; use one-hot
    # v2 = [c, 0, ...] so expected = c * v1
    c = int(RNG.integers(1, t))
    v2 = [c] + [0] * (ctx.degree - 1)
    ct = bfv.ct_to_eval(bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1")))
    pt2 = bfv.plaintext_to_eval(ctx, bfv.encode(ctx, v2))
    prod = bfv.ct_mul_pt(ct, pt2)
    out = bfv.decode(ctx, bfv.decrypt(bfv.ct_to_coeff(prod), sk))
    assert out == [(a * c) % t for a in v1]


@pytest.mark.parametrize("name,bits", [p for p in PARAM_SETS if "512" in p[0] or "5x18" in p[0]])
def test_mod_switch_down(name, bits):
    ctx = make_ctx(name, bits)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    vals = rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"1"))
    nb_before = bfv.noise_budget(ct, sk)
    ct2 = bfv.mod_switch_down(ct)
    assert ct2.moduli_count == ct.moduli_count - 1
    assert bfv.decode(ctx, bfv.decrypt(ct2, sk)) == vals
    single = bfv.mod_switch_down_to_single(ct)
    assert single.moduli_count == 1
    assert bfv.decode(ctx, bfv.decrypt(single, sk)) == vals
    assert nb_before > 0


def test_seeded_encryption_deterministic():
    """Same seed -> same `a` polynomial (seed-compression contract)."""
    ctx = make_ctx("insecure_n_8_logq_5x18_logt_5", 32)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    seed = bytes(range(32))
    ct1 = bfv.encrypt_zero(ctx, sk, seed=seed, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt_zero(ctx, sk, seed=seed, err_rng=det_rng(b"2"))
    assert (np.asarray(ct1.polys[1].data) == np.asarray(ct2.polys[1].data)).all()
    assert ct1.seed == seed


def test_transparent_zero():
    ctx = make_ctx("insecure_n_8_logq_5x18_logt_5", 32)
    from she_tpu.core.poly import PolyRq

    zero = bfv.Ciphertext(
        ctx,
        [PolyRq.zero(ctx.ciphertext_context), PolyRq.zero(ctx.ciphertext_context)],
    )
    assert bfv.is_transparent(zero)


def test_ciphertext_operators():
    ctx = make_ctx("insecure_n_8_logq_5x18_logt_5", 32)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    v1, v2 = rand_values(ctx), rand_values(ctx)
    ct1 = bfv.encrypt(bfv.encode(ctx, v1), sk, err_rng=det_rng(b"1"))
    ct2 = bfv.encrypt(bfv.encode(ctx, v2), sk, err_rng=det_rng(b"2"))
    pt2 = bfv.encode(ctx, v2)
    assert bfv.decode(ctx, (ct1 + ct2).decrypt(sk)) == [(a + b) % t for a, b in zip(v1, v2)]
    assert bfv.decode(ctx, (ct1 - pt2).decrypt(sk)) == [(a - b) % t for a, b in zip(v1, v2)]
    assert bfv.decode(ctx, (-ct1).decrypt(sk)) == [(-a) % t for a in v1]
    assert (ct1 * ct2).noise_budget(sk) > 0


def test_extras_remove_last_moduli():
    from she_tpu.bfv import extras
    from she_tpu.core.poly import PolyRq
    import numpy as np

    ctx = make_ctx("insecure_n_8_logq_5x18_logt_5", 32)
    sk_ctx = ctx.secret_key_context
    vals = np.zeros((5, 8), dtype=object)
    vals[:, 0] = [1, 2, 3, 4, 5]
    p = PolyRq.from_values(vals, sk_ctx, "coeff")
    out = extras.remove_last_moduli(p, 2)
    assert len(out.context.moduli) == 3
    assert (out.to_values() == vals[:3]).all()

"""Scheme-API conformance tests mirroring the reference's generic property
suite (Sources/_TestUtilities/HeApiTestUtils.swift:106-1698): the behaviors
not already covered by test_bfv_basic/test_bfv_mul — noise budget, inner
products with skipped (None) plaintexts, repeated addition, encrypt-zero,
Eval-plaintext encode with moduli_count, multi-step rotation, and the NoOp
scheme plumbing (NoOpScheme.swift:31-60)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, extras, keys, noop
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(7)

PARAM_SETS = [
    ("insecure_n_8_logq_5x18_logt_5", 32),
    ("insecure_n_8_logq_5x18_logt_5", 64),
    ("insecure_n_512_logq_4x60_logt_20", 64),
]


def make_ctx(name, bits):
    return bfv.get_bfv_context(paramsmod.from_predefined(name, scalar_bits=bits))


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


def rand_values(ctx):
    return [int(v) for v in RNG.integers(0, ctx.plaintext_modulus, size=ctx.degree)]


def negacyclic_mul(a, b, t):
    """Coefficient-encoding multiply = negacyclic convolution mod t."""
    n = len(a)
    out = [0] * n
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % t
            else:
                out[k - n] = (out[k - n] - ai * bj) % t
    return out


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_noise_budget_fresh_positive_and_decreases(name, bits):
    """schemeNoiseBudgetTest: fresh budget > 0; budget drops after ct+ct
    (HeApiTestUtils.swift noise-budget section; HeScheme.swift:1045-1066)."""
    ctx = make_ctx(name, bits)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    ct = bfv.encrypt(bfv.encode(ctx, rand_values(ctx)), sk, err_rng=det_rng(b"e"))
    fresh = bfv.noise_budget(ct, sk)
    assert fresh > 0
    acc = ct
    for _ in range(4):
        acc = bfv.ct_add(acc, acc)
    assert bfv.noise_budget(acc, sk) < fresh


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_repeated_addition_matches_scalar_multiple(name, bits):
    """schemeRepeatedAdditionTest: sum of k copies decrypts to k*m mod t."""
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    vals = rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"e"))
    acc = ct
    k = 5
    for _ in range(k - 1):
        acc = bfv.ct_add(acc, ct)
    got = bfv.decode(ctx, bfv.decrypt(acc, sk))
    assert got == [(v * k) % t for v in vals]


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_encrypt_zero_decrypts_to_zero(name, bits):
    """schemeEncryptZeroTest (Bfv+Encrypt.swift:150-181)."""
    ctx = make_ctx(name, bits)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    ct = bfv.encrypt_zero(ctx, sk, err_rng=det_rng(b"e"))
    got = bfv.decode(ctx, bfv.decrypt(ct, sk))
    assert got == [0] * ctx.degree
    assert not bfv.is_transparent(ct)


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_inner_product_ct_pt_with_none_plaintexts(name, bits):
    """innerProduct with nil plaintexts skipped (HeScheme.swift:731-826) —
    the PIR processed-database path where zero plaintexts are stored as
    None (IndexPirProtocol.swift:249-379)."""
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    n_terms = 4
    ct_vals = [rand_values(ctx) for _ in range(n_terms)]
    pt_vals = [rand_values(ctx) for _ in range(n_terms)]
    cts = [
        bfv.ct_to_eval(
            bfv.encrypt(bfv.encode(ctx, v), sk, err_rng=det_rng(bytes([i])))
        )
        for i, v in enumerate(ct_vals)
    ]
    pts = [bfv.plaintext_to_eval(ctx, bfv.encode(ctx, v)) for v in pt_vals]
    pts[2] = None  # skipped zero plaintext
    result = bfv.inner_product_ct_pt(cts, pts)
    got = bfv.decode(ctx, bfv.decrypt(bfv.ct_to_coeff(result), sk))
    expected = [0] * ctx.degree
    for k in range(n_terms):
        if k == 2:
            continue
        term = negacyclic_mul(ct_vals[k], pt_vals[k], t)
        expected = [(x + y) % t for x, y in zip(expected, term)]
    assert got == expected


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_eval_plaintext_moduli_count(name, bits):
    """Eval plaintexts at reduced moduliCount round-trip
    (Bfv+Encode.swift:29-62, Plaintext.swift moduliCount conversions)."""
    ctx = make_ctx(name, bits)
    vals = rand_values(ctx)
    pt = bfv.encode(ctx, vals)
    for c in (1, len(ctx.ciphertext_context.moduli)):
        ev = bfv.plaintext_to_eval(ctx, pt, moduli_count=c)
        assert len(ev.poly.moduli) == c
        back = bfv.plaintext_to_coeff(ev)
        assert bfv.decode(ctx, back) == vals


def test_multi_step_rotation_composes():
    """rotateColumnsMultiStep: a step with no direct Galois key is composed
    from supported steps (Extras/HeScheme.swift:21-65, Galois.swift:272-319)."""
    ctx = make_ctx("insecure_n_512_logq_4x60_logt_20", 64)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    from she_tpu.ops import galois as galoismod

    n = ctx.degree
    steps = [1, 2, 4]
    elements = [galoismod.rotating_columns_element(s, n) for s in steps]
    ek = keys.generate_evaluation_key(
        ctx,
        keys.EvaluationKeyConfig(galois_elements=tuple(elements)),
        sk,
        det_rng(b"k"),
    )
    vals = rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, vals, fmt="simd"), sk, err_rng=det_rng(b"e"))
    from she_tpu.pnns.pnns import rotate_columns_multi_step

    rotated = rotate_columns_multi_step(ct, 7, ek)  # 7 = 1+2+4, no direct key
    got = bfv.decode(ctx, bfv.decrypt(rotated, sk), fmt="simd")
    half = ctx.degree // 2
    rows = [vals[:half], vals[half:]]
    direct = bfv.rotate_columns(ct, 1, ek)
    one = bfv.decode(ctx, bfv.decrypt(direct, sk), fmt="simd")
    # rotate_columns(ct, 1) defines the per-row direction; applying it 7x
    # must equal the composed multi-step rotation.
    acc = ct
    for _ in range(7):
        acc = bfv.rotate_columns(acc, 1, ek)
    stepwise = bfv.decode(ctx, bfv.decrypt(acc, sk), fmt="simd")
    assert got == stepwise
    assert one != vals  # sanity: rotation moved something


def test_noop_scheme_plumbing():
    """NoOpScheme exercises the generic API cheaply (NoOpScheme.swift:31+)."""
    ctx = make_ctx("insecure_n_8_logq_5x18_logt_5", 32)
    t = ctx.plaintext_modulus
    vals = [int(v) for v in RNG.integers(0, t, size=ctx.degree)]
    vals2 = [int(v) for v in RNG.integers(0, t, size=ctx.degree)]
    sk = noop.generate_secret_key(ctx)
    pt = bfv.encode(ctx, vals)
    ct = noop.encrypt(pt, sk)
    assert bfv.decode(ctx, noop.decrypt(ct, sk)) == vals
    s = noop.ct_add(ct, noop.encrypt(bfv.encode(ctx, vals2), sk))
    assert bfv.decode(ctx, noop.decrypt(s, sk)) == [
        (a + b) % t for a, b in zip(vals, vals2)
    ]
    p = noop.ct_mul(ct, noop.encrypt(bfv.encode(ctx, vals2), sk))
    assert bfv.decode(ctx, noop.decrypt(p, sk)) == negacyclic_mul(vals, vals2, t)
    assert noop.noise_budget(ct, sk) > 0


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_mod_switch_down_to_single_preserves_value(name, bits):
    """modSwitchDownToSingle walks the chain to one modulus
    (HeScheme.swift:1481-1485)."""
    ctx = make_ctx(name, bits)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    vals = rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"e"))
    single = bfv.mod_switch_down_to_single(ct)
    assert len(single.polys[0].moduli) == 1
    assert bfv.decode(ctx, bfv.decrypt(single, sk)) == vals


@pytest.mark.parametrize("name,bits", PARAM_SETS)
def test_ct_sub_pt_and_pt_sub_orders(name, bits):
    """ct−pt (HeScheme.swift:658-729): subtraction in both operand orders
    via negation."""
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    vals = rand_values(ctx)
    pvals = rand_values(ctx)
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"e"))
    pt = bfv.encode(ctx, pvals)
    got = bfv.decode(ctx, bfv.decrypt(bfv.ct_sub_pt(ct, pt), sk))
    assert got == [(a - b) % t for a, b in zip(vals, pvals)]
    got2 = bfv.decode(ctx, bfv.decrypt(bfv.ct_neg(bfv.ct_sub_pt(ct, pt)), sk))
    assert got2 == [(b - a) % t for a, b in zip(vals, pvals)]

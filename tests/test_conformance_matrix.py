"""Scheme-conformance matrix: the HeApiTestUtils battery swept over EVERY
predefined parameter set at both scalar widths (where supportsScalar32),
mirroring how HeAPITests.swift instantiates the ~35 generic scheme*Test
helpers over Bfv<UInt32>/Bfv<UInt64> x PredefinedRlweParameters
(Sources/_TestUtilities/HeApiTestUtils.swift:106-1698,
EncryptionParameters.swift:243-537). Rotations, skipLSBs and
seeded-ciphertext round-trips run at production N (4096/8192)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.io import serialize as ser
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

ALL_COMBOS = [
    (name, bits)
    for name in paramsmod.PREDEFINED_RLWE_PARAMETERS
    for bits in (32, 64)
    if bits == 64 or paramsmod.predefined_supports_scalar32(name)
]

_CTX_CACHE: dict = {}


def make_ctx(name, bits):
    key = (name, bits)
    if key not in _CTX_CACHE:
        _CTX_CACHE[key] = bfv.get_bfv_context(
            paramsmod.from_predefined(name, scalar_bits=bits)
        )
    return _CTX_CACHE[key]


def det_rng(tag: bytes):
    return nist_aes128_ctr((tag * 32)[:32])


def rand_values(ctx, seed=0):
    rng = np.random.default_rng(seed)
    return [int(v) for v in rng.integers(0, ctx.plaintext_modulus, size=ctx.degree)]


@pytest.mark.parametrize("name,bits", ALL_COMBOS, ids=lambda v: str(v))
def test_scheme_op_battery(name, bits):
    """encode/decode (unsigned+signed, coeff+simd), encrypt/decrypt, ct±ct,
    neg, ct±pt, ct·pt, modSwitchDownToSingle, multiplyPowerOfX, transparency
    — exact plaintext arithmetic mod t on every predefined set."""
    ctx = make_ctx(name, bits)
    t = ctx.plaintext_modulus
    n = ctx.degree
    vals = rand_values(ctx, seed=1)
    pvals = rand_values(ctx, seed=2)

    # encode/decode round trips (schemeEncodeDecodeTest)
    pt = bfv.encode(ctx, vals)
    assert bfv.decode(ctx, pt) == vals
    signed = [v - (t // 2) for v in rand_values(ctx, seed=3)]
    assert bfv.decode_signed(ctx, bfv.encode_signed(ctx, signed)) == signed
    if ctx.supports_simd_encoding:
        spt = bfv.encode(ctx, vals, fmt="simd")
        assert bfv.decode(ctx, spt, fmt="simd") == vals
        assert (
            bfv.decode_signed(ctx, bfv.encode_signed(ctx, signed, fmt="simd"), fmt="simd")
            == signed
        )

    # encrypt/decrypt (schemeEncryptDecryptTest)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    ct = bfv.encrypt(pt, sk, err_rng=det_rng(b"a"))
    assert bfv.decode(ctx, bfv.decrypt(ct, sk)) == vals
    assert bfv.noise_budget(ct, sk) > 0

    # ct±ct, neg (schemeCiphertextAdd/Subtract/NegateTest)
    ct2 = bfv.encrypt(bfv.encode(ctx, pvals), sk, err_rng=det_rng(b"b"))
    assert bfv.decode(ctx, bfv.decrypt(bfv.ct_add(ct, ct2), sk)) == [
        (a + b) % t for a, b in zip(vals, pvals)
    ]
    assert bfv.decode(ctx, bfv.decrypt(bfv.ct_sub(ct, ct2), sk)) == [
        (a - b) % t for a, b in zip(vals, pvals)
    ]
    assert bfv.decode(ctx, bfv.decrypt(bfv.ct_neg(ct), sk)) == [
        (-a) % t for a in vals
    ]

    # ct±pt, ct·pt (schemeCiphertextPlaintext*Test)
    pt2 = bfv.encode(ctx, pvals)
    assert bfv.decode(ctx, bfv.decrypt(bfv.ct_add_pt(ct, pt2), sk)) == [
        (a + b) % t for a, b in zip(vals, pvals)
    ]
    assert bfv.decode(ctx, bfv.decrypt(bfv.ct_sub_pt(ct, pt2), sk)) == [
        (a - b) % t for a, b in zip(vals, pvals)
    ]
    if ctx.supports_simd_encoding:
        sv = rand_values(ctx, seed=4)
        pv = rand_values(ctx, seed=5)
        sct = bfv.ct_to_eval(
            bfv.encrypt(bfv.encode(ctx, sv, fmt="simd"), sk, err_rng=det_rng(b"c"))
        )
        spt = bfv.plaintext_to_eval(ctx, bfv.encode(ctx, pv, fmt="simd"))
        prod = bfv.ct_to_coeff(bfv.ct_mul_pt(sct, spt))
        assert bfv.decode(ctx, bfv.decrypt(prod, sk), fmt="simd") == [
            (a * b) % t for a, b in zip(sv, pv)
        ]

    # modSwitchDownToSingle (HeScheme.swift:1481-1485)
    single = bfv.mod_switch_down_to_single(ct)
    assert len(single.polys[0].moduli) == 1
    assert bfv.decode(ctx, bfv.decrypt(single, sk)) == vals

    # multiplyPowerOfX negacyclic shift (PolyRq.swift:398-422)
    shifted = bfv.multiply_power_of_x(ct, 1)
    want = [(-vals[-1]) % t] + vals[:-1]
    assert bfv.decode(ctx, bfv.decrypt(shifted, sk)) == want

    # transparency (Bfv+Encrypt.swift:48-62)
    assert not bfv.is_transparent(ct)
    assert bfv.is_transparent(bfv.ct_sub(ct, ct))


@pytest.mark.parametrize("name,bits", ALL_COMBOS, ids=lambda v: str(v))
def test_serialization_roundtrips(name, bits):
    """Seeded-ciphertext and skipLSBs/forDecryption wire round-trips on
    every set, incl. production N (SerializedCiphertext.swift:22-160,
    Bfv+Decrypt.swift:51-109)."""
    ctx = make_ctx(name, bits)
    vals = rand_values(ctx, seed=6)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    seed = bytes(range(32))
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, seed=seed, err_rng=det_rng(b"e"))

    # seeded serialization: half-size wire format, re-expanded `a`
    s = ser.serialize_ciphertext(ct)
    assert s.kind == "seeded" and s.seed == seed
    back = ser.deserialize_ciphertext(s, ctx, "coeff")
    assert bfv.decode(ctx, bfv.decrypt(back, sk)) == vals

    # full serialization with per-poly LSB skipping, decryption-only
    single = bfv.mod_switch_down_to_single(ct)
    single = bfv.Ciphertext(ctx, single.polys, single.correction_factor)
    skip = ser.skip_lsbs_for_decryption(single)
    s2 = ser.serialize_ciphertext(single, for_decryption=True)
    assert s2.kind == "full"
    assert any(k > 0 for k in s2.skip_lsbs) or max(skip) == 0
    back2 = ser.deserialize_ciphertext(s2, ctx, "coeff", moduli_count=1)
    assert bfv.decode(ctx, bfv.decrypt(back2, sk)) == vals


ROTATION_COMBOS = [
    (name, bits)
    for name, bits in ALL_COMBOS
    if paramsmod.PREDEFINED_RLWE_PARAMETERS[name].poly_degree >= 4096
]


@pytest.mark.parametrize("name,bits", ROTATION_COMBOS, ids=lambda v: str(v))
def test_rotation_and_relinearization_at_production_n(name, bits):
    """rotate/swapRows via Galois keys and ct·ct+relinearize at N>=4096
    (HeScheme.swift:1463-1477, Bfv.swift:174-219)."""
    ctx = make_ctx(name, bits)
    if not ctx.supports_evaluation_key:
        pytest.skip("set has a single modulus: no key-switching context")
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    half = ctx.degree // 2

    if ctx.supports_simd_encoding:
        from she_tpu.ops import galois as galoismod

        elements = (
            galoismod.rotating_columns_element(1, ctx.degree),
            galoismod.swapping_rows_element(ctx.degree),
        )
        ek = keys.generate_evaluation_key(
            ctx,
            keys.EvaluationKeyConfig(
                galois_elements=elements, has_relinearization_key=True
            ),
            sk,
            det_rng(b"k"),
        )
        vals = rand_values(ctx, seed=7)
        ct = bfv.encrypt(bfv.encode(ctx, vals, fmt="simd"), sk, err_rng=det_rng(b"e"))
        rot = bfv.rotate_columns(ct, 1, ek)
        got = bfv.decode(ctx, bfv.decrypt(rot, sk), fmt="simd")
        rows = [vals[:half], vals[half:]]
        want = [r[-1:] + r[:-1] for r in rows]  # right-rotation per SIMD row
        assert got == want[0] + want[1]
        sw = bfv.swap_rows(ct, ek)
        assert bfv.decode(ctx, bfv.decrypt(sw, sk), fmt="simd") == vals[half:] + vals[:half]
    else:
        ek = keys.generate_evaluation_key(
            ctx,
            keys.EvaluationKeyConfig(has_relinearization_key=True),
            sk,
            det_rng(b"k"),
        )

    # ct·ct + relinearize: x * y at low degree so the product is exact
    rng = np.random.default_rng(8)
    a = [int(v) for v in rng.integers(0, min(t, 16), size=8)] + [0] * (ctx.degree - 8)
    b = [int(v) for v in rng.integers(0, min(t, 16), size=8)] + [0] * (ctx.degree - 8)
    ca = bfv.encrypt(bfv.encode(ctx, a), sk, err_rng=det_rng(b"1"))
    cb = bfv.encrypt(bfv.encode(ctx, b), sk, err_rng=det_rng(b"2"))
    prod = bfv.ct_mul_relin(ca, cb, ek)
    assert len(prod.polys) == 2
    got = bfv.decode(ctx, bfv.decrypt(prod, sk))
    full = np.convolve(np.array(a[:8], dtype=np.int64), np.array(b[:8], dtype=np.int64))
    want = [int(v) % t for v in full] + [0] * (ctx.degree - len(full))
    assert got == want[: ctx.degree]

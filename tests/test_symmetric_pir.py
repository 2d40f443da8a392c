"""Symmetric PIR / VOPRF tests (analogue of SymmetricPIRTests)."""

import random

import numpy as np
import pytest

from she_tpu.pir import oprf, symmetric_pir as spir


def test_curve_basics():
    g = oprf.GENERATOR
    g2 = oprf.point_add(g, g)
    assert oprf.point_mul(2, g) == g2
    assert oprf.point_mul(3, g) == oprf.point_add(g2, g)
    assert oprf.point_add(g, oprf.point_neg(g)) is None
    # n * G = identity
    assert oprf.point_mul(oprf.N, g) is None
    # serialization round trip
    p = oprf.point_mul(12345, g)
    assert oprf.deserialize_element(oprf.serialize_element(p)) == p


def test_hash_to_curve_on_curve():
    for msg in [b"", b"abc", b"hello world", bytes(100)]:
        pt = oprf.hash_to_curve(msg, b"QUUX-V01-CS02-with-P384_XMD:SHA-384_SSWU_RO_")
        x, y = pt
        assert (y * y - (pow(x, 3, oprf.P) + oprf.A * x + oprf.B)) % oprf.P == 0


def test_expand_message_xmd_properties():
    dst = b"QUUX-V01-CS02-with-expander-SHA384"
    out1 = oprf._expand_message_xmd(b"abc", dst, 32)
    out2 = oprf._expand_message_xmd(b"abc", dst, 32)
    assert out1 == out2 and len(out1) == 32
    # longer outputs extend deterministically across block boundaries
    long = oprf._expand_message_xmd(b"abc", dst, 100)
    assert len(long) == 100
    assert oprf._expand_message_xmd(b"abd", dst, 32) != out1
    assert oprf._expand_message_xmd(b"abc", dst + b"2", 32) != out1


# ---------------------------------------------------------------------------
# Official RFC known-answer vectors
# ---------------------------------------------------------------------------


def test_expand_message_xmd_rfc9380_k1_vectors():
    """RFC 9380 §K.1: expand_message_xmd(SHA-256) official vectors — the
    hash is parameterized, so these exercise the exact expander code path
    the P384 suite uses (same dst_prime/b0/b_i chaining)."""
    import hashlib

    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    assert (
        oprf._expand_message_xmd(b"", dst, 0x20, hashlib.sha256).hex()
        == "68a985b87eb6b46952128911f2a4412bbc302a9d759667f87f7a21d803f07235"
    )
    assert (
        oprf._expand_message_xmd(b"abc", dst, 0x20, hashlib.sha256).hex()
        == "d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b97902f53a8a0d605615"
    )


def test_hash_to_curve_rfc9380_j2_vector():
    """RFC 9380 §J.2.1: P384_XMD:SHA-384_SSWU_RO_ official vector (msg=""):
    byte-exact x AND y — covers expand_message_xmd(SHA-384), hash_to_field,
    the SSWU map, and the two-point add of the full suite."""
    dst = b"QUUX-V01-CS02-with-P384_XMD:SHA-384_SSWU_RO_"
    x, y = oprf.hash_to_curve(b"", dst)
    assert "%096x" % x == (
        "eb9fe1b4f4e14e7140803c1d99d0a93cd823d2b024040f9c067a8eca1f5a2eea"
        "c9ad604973527a356f3fa3aeff0e4d83"
    )
    assert "%096x" % y == (
        "0c21708cff382b7f4643c07b105c2eaec2cead93a917d825601e63c8f21f6abd"
        "9abc22c93c2bed6f235954b25048bb1a"
    )


def test_derive_key_pair_rfc9497_a4_vector():
    """RFC 9497 Appendix A.4 (P384-SHA384), Seed = 0xa3*32, KeyInfo =
    "test key": the VOPRF-mode skSm official vector, byte-exact — covers
    DeriveKeyPair and HashToScalar (contextString + DST construction)."""
    seed = bytes([0xA3] * 32)
    info = b"test key"
    sk = oprf.derive_key_pair(seed, info, mode=oprf.MODE_VOPRF)
    assert "%096x" % sk == (
        "051646b9e6e7a71ae27c1e1d0b87b4381db6d3595eeeb1adb41579adbf992f42"
        "78f9016eafc944edaa2b43183581779d"
    )


def test_p384_arithmetic_vs_cryptography():
    """Cross-check the from-scratch curve arithmetic against the vetted
    `cryptography` (OpenSSL-backed) P-384: scalar-mult of the generator and
    ECDH shared secrets for assorted scalars, plus compressed-point
    serialization."""
    ec = pytest.importorskip("cryptography.hazmat.primitives.asymmetric.ec")
    import hashlib

    for k in [1, 2, 3, 0xDEADBEEF, 12345678901234567890123456789, oprf.N - 1]:
        priv = ec.derive_private_key(k, ec.SECP384R1())
        pub = priv.public_key().public_numbers()
        assert oprf.point_mul(k, oprf.GENERATOR) == (pub.x, pub.y)
    for i in range(3):
        k1 = int.from_bytes(hashlib.sha384(b"k1%d" % i).digest(), "big") % oprf.N
        k2 = int.from_bytes(hashlib.sha384(b"k2%d" % i).digest(), "big") % oprf.N
        p1 = ec.derive_private_key(k1, ec.SECP384R1())
        p2 = ec.derive_private_key(k2, ec.SECP384R1())
        shared = p1.exchange(ec.ECDH(), p2.public_key())
        ours = oprf.point_mul(k1, oprf.point_mul(k2, oprf.GENERATOR))
        assert shared == ours[0].to_bytes(48, "big")


def test_oprf_blind_evaluate_finalize_consistency():
    """Client blind->evaluate->finalize equals server direct evaluation."""
    sk = oprf.OprfPrivateKey(bytes(47) + b"\x07")
    pk = sk.public_key
    for keyword in [b"alice", b"bob", b"x" * 100]:
        ctx = pk.blind(keyword, blind=123456789)
        response = sk.blind_evaluate(ctx.blinded_element, proof_r=987654321)
        output = pk.finalize(ctx, response)
        assert output == sk.evaluate(keyword)
        assert len(output) == 48


def test_oprf_proof_rejects_wrong_key():
    sk = oprf.OprfPrivateKey(bytes(47) + b"\x07")
    other = oprf.OprfPrivateKey(bytes(47) + b"\x09")
    pk = sk.public_key
    ctx = pk.blind(b"keyword")
    bad_response = other.blind_evaluate(ctx.blinded_element)
    with pytest.raises(ValueError):
        pk.finalize(ctx, bad_response)


def test_symmetric_pir_end_to_end():
    config = spir.SymmetricPirConfig(bytes(47) + b"\x05")
    rows = [(b"keyword-a", b"value-a"), (b"keyword-b", b"another value")]
    processed = spir.symmetric_pir_process(rows, config)
    assert len(processed) == 2
    # keywords are replaced and values encrypted
    assert processed[0][0] != rows[0][0]
    assert len(processed[0][0]) == 16
    assert processed[0][1] != rows[0][1]

    server = spir.OprfServer(config)
    client = spir.OprfClient(config.client_config())
    for (kw, value), (obliv_kw, sealed) in zip(rows, processed):
        ctx = client.query_context(kw)
        response = server.compute_response(ctx.query)
        parsed = client.parse(response, ctx)
        # the client-derived oblivious keyword matches the database row's
        assert parsed.oblivious_keyword == obliv_kw
        assert client.decrypt(sealed, parsed) == value

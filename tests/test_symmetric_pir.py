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
    """Structural checks (byte-level RFC 9380 vectors not available offline)."""
    dst = b"QUUX-V01-CS02-with-expander-SHA384"
    out1 = oprf._expand_message_xmd(b"abc", dst, 32)
    out2 = oprf._expand_message_xmd(b"abc", dst, 32)
    assert out1 == out2 and len(out1) == 32
    # longer outputs extend deterministically across block boundaries
    long = oprf._expand_message_xmd(b"abc", dst, 100)
    assert len(long) == 100
    assert oprf._expand_message_xmd(b"abd", dst, 32) != out1
    assert oprf._expand_message_xmd(b"abc", dst + b"2", 32) != out1


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

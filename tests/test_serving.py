"""Batched TPU serving pipeline: bit-identical to the reference-path server."""

import os

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def setup():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    config = ip.IndexPirConfig(
        entry_count=10,
        entry_size_in_bytes=2,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(11)
    database = [bytes(rng.integers(0, 256, size=2).tolist()) for _ in range(10)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    return ctx, sk, parameter, database, processed, client, ek


def test_expansion_plan_matches_recursive(setup):
    ctx, sk, parameter, database, processed, client, ek = setup
    for count in [2, 3, 5, 7, 8]:
        one_indices = [0, count - 1]
        cts = ip.compress_binary_inputs(count, one_indices, ctx, sk)
        reference = ip.expand(cts, count, ek)
        batched = serving.expand_batched(cts, count, ek, ctx)
        assert len(batched) == len(reference)
        for r, b in zip(reference, batched):
            for rp, bp in zip(r.polys, b.polys):
                assert (np.asarray(rp.data) == np.asarray(bp.data)).all(), count


def test_batched_server_matches_reference(setup):
    ctx, sk, parameter, database, processed, client, ek = setup
    reference_server = ip.MulPirServer(parameter, ctx, [processed])
    batched_server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    indices = [1, 4, 7]
    queries = [client.generate_query([i], sk) for i in indices]
    batch_responses = batched_server.compute_response_batch(queries, ek)
    for i, (index, query) in enumerate(zip(indices, queries)):
        ref_response = reference_server.compute_response(query, ek)
        got = client.decrypt(batch_responses[i], [index], sk)
        ref = client.decrypt(ref_response, [index], sk)
        assert got == ref
        assert got[0][:2] == database[index]
        # bit-identical ciphertexts
        for ref_reply, got_reply in zip(ref_response.ciphertexts, batch_responses[i].ciphertexts):
            for rc, gc in zip(ref_reply, got_reply):
                for rp, gp in zip(rc.polys, gc.polys):
                    assert (np.asarray(rp.data) == np.asarray(gp.data)).all()


def test_staged_server_matches_reference(setup, monkeypatch):
    """The staged pipeline (default for w64 on accelerator backends) is
    bit-identical to the reference-path server on the w32 path too."""
    monkeypatch.setenv("SHE_TPU_STAGED_SERVING", "1")
    ctx, sk, parameter, database, processed, client, ek = setup
    reference_server = ip.MulPirServer(parameter, ctx, [processed])
    staged_server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    indices = [1, 4, 7]
    queries = [client.generate_query([i], sk) for i in indices]
    batch_responses = staged_server.compute_response_batch(queries, ek)
    assert staged_server._staged is not None
    for i, (index, query) in enumerate(zip(indices, queries)):
        ref_response = reference_server.compute_response(query, ek)
        got = client.decrypt(batch_responses[i], [index], sk)
        assert got[0][:2] == database[index]
        for ref_reply, got_reply in zip(
            ref_response.ciphertexts, batch_responses[i].ciphertexts
        ):
            for rc, gc in zip(ref_reply, got_reply):
                for rp, gp in zip(rc.polys, gc.polys):
                    assert (np.asarray(rp.data) == np.asarray(gp.data)).all()


def test_batched_server_repeat_uses_cached_jit(setup):
    ctx, sk, parameter, database, processed, client, ek = setup
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    queries = [client.generate_query([2], sk), client.generate_query([3], sk)]
    r1 = server.compute_response_batch(queries, ek)
    r2 = server.compute_response_batch(queries, ek)
    assert len(server._respond_jit) == 1
    for a, b in zip(r1, r2):
        for ra, rb in zip(a.ciphertexts[0], b.ciphertexts[0]):
            for pa, pb in zip(ra.polys, rb.polys):
                assert (np.asarray(pa.data) == np.asarray(pb.data)).all()


def test_batched_keyword_server(setup):
    import random

    from she_tpu.pir import keyword_pir as kp

    ctx, sk, parameter, database, processed, client, ek = setup
    rows = [(f"kw{i}".encode(), bytes([i, i + 1])) for i in range(12)]
    bucket_size = kp.default_max_serialized_bucket_size(2, ctx.params.bytes_per_plaintext)
    config = kp.KeywordPirConfig(
        dimension_count=2,
        cuckoo_table_config=kp.CuckooTableConfig.default_keyword_pir(bucket_size),
    )
    kw_processed = kp.KeywordPirServer.process(rows, config, ctx, rng=random.Random(7))
    kw_client = kp.KeywordPirClient(
        kw_processed.keyword_pir_parameter, kw_processed.pir_parameter, ctx
    )
    kw_ek = kw_client.generate_evaluation_key(sk, det_rng(b"k2"))
    server = serving.BatchedKeywordPirServer(ctx, kw_processed)
    keywords = [rows[0][0], rows[5][0], b"missing"]
    queries = [kw_client.generate_query(kw, sk) for kw in keywords]
    responses = server.compute_response_batch(queries, kw_ek)
    assert kw_client.decrypt(responses[0], keywords[0], sk) == rows[0][1]
    assert kw_client.decrypt(responses[1], keywords[1], sk) == rows[5][1]
    assert kw_client.decrypt(responses[2], keywords[2], sk) is None


@pytest.fixture(scope="module")
def w64_setup():
    """Shared w64 config + ONE eager reference-server evaluation.

    The eager reference pass is the expensive part on XLA:CPU (per-op
    compiles, ~2-15 min depending on cache/host — same cost in the
    round-4-era test, verified against that commit), so it runs once and
    both the eager-vmap and staged batched servers compare against the
    same captured arrays."""
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 64)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    config = ip.IndexPirConfig(
        entry_count=12,
        entry_size_in_bytes=1,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(5)
    database = [bytes(rng.integers(0, 256, size=1).tolist()) for _ in range(12)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    indices = [0, 11]
    queries = [client.generate_query([i], sk) for i in indices]
    reference_server = ip.MulPirServer(parameter, ctx, [processed])
    ref_arrays = [
        [
            [np.asarray(jnp_stack_polys(ct)) for ct in reply]
            for reply in reference_server.compute_response(q, ek).ciphertexts
        ]
        for q in queries
    ]
    return ctx, sk, parameter, database, processed, client, ek, indices, queries, ref_arrays


def jnp_stack_polys(ct):
    return np.stack([np.asarray(p.data) for p in ct.polys])


@pytest.mark.parametrize(
    "staged",
    [
        False,
        pytest.param(
            True,
            marks=pytest.mark.skipif(
                os.environ.get("SHE_TPU_SLOW_TESTS") != "1",
                reason="staged w64 under pytest exceeds 20 min on XLA:CPU; "
                "run benchmarks/staged_w64_cpu_check.py or set "
                "SHE_TPU_SLOW_TESTS=1",
            ),
        ),
    ],
)
def test_batched_server_w64(staged, monkeypatch, w64_setup):
    """Batched serving on the 2-limb (w64) path matches the reference-path
    server bit-for-bit and decrypts correctly (eager-vmap CPU default and
    the staged pipeline that accelerator backends default to — the round-4
    review's CPU-coverage item for the staged w64 programs).

    The staged variant is gated by SHE_TPU_SLOW_TESTS: the w64 EAGER
    reference pass costs 20-40+ min of XLA:CPU per-op compiles on this
    2-core host when its in-process caches are cold (measured identically
    against the round-4 commit in a worktree — a long-standing XLA:CPU
    property, not a regression). The staged respond itself compiles in
    ~70 s from the disk cache (benchmarks/staged_w64_cpu_check.py).
    Coverage without the gate: the w32 staged test above exercises the
    same donated-pool stage code bit-exactly against the reference, and
    the TPU bench decrypt-checks staged w64 end-to-end every round."""
    (ctx, sk, parameter, database, processed, client, ek, indices, queries,
     ref_arrays) = w64_setup
    if staged:
        monkeypatch.setenv("SHE_TPU_STAGED_SERVING", "1")
    batched_server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    batch_responses = batched_server.compute_response_batch(queries, ek)
    if staged:
        assert batched_server._staged is not None
    for i, index in enumerate(indices):
        got = client.decrypt(batch_responses[i], [index], sk)
        assert got[0][:1] == database[index]
        for ref_reply, got_reply in zip(
            ref_arrays[i], batch_responses[i].ciphertexts
        ):
            for ref_ct, gc in zip(ref_reply, got_reply):
                got_ct = np.stack([np.asarray(p.data) for p in gc.polys])
                assert (ref_ct == got_ct).all()


def test_batched_server_mxu_dim0_matches(setup, monkeypatch):
    """The MXU digit-matmul dim-0 kernel (default on TPU) is bit-identical
    to the VPU lazy-MAC kernel on the w32 path."""
    monkeypatch.setenv("SHE_TPU_DIM0_MXU", "1")
    ctx, sk, parameter, database, processed, client, ek = setup
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    assert server.use_dim0_mxu
    queries = [client.generate_query([i], sk) for i in (1, 7, 9)]
    responses = server.compute_response_batch(queries, ek)
    reference = ip.MulPirServer(parameter, ctx, [processed])
    for q, r in zip(queries, responses):
        want = reference.compute_response(q, ek)
        for a, b in zip(r.ciphertexts[0], want.ciphertexts[0]):
            for pa, pb in zip(a.polys, b.polys):
                assert (np.asarray(pa.data) == np.asarray(pb.data)).all()


@pytest.mark.parametrize(
    "compression", [ip.PirKeyCompression.HYBRID, ip.PirKeyCompression.MAX]
)
def test_batched_server_key_compression(compression):
    """MulPIR e2e through the batched server under hybrid/max key
    compression (MulPir.swift:86-109): fewer Galois keys, expansion
    applies the largest available element repeatedly; bit-identical to the
    reference-path server."""
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    config = ip.IndexPirConfig(
        entry_count=24,
        entry_size_in_bytes=1,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=compression,
    )
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(13)
    database = [bytes([int(v)]) for v in rng.integers(0, 256, size=24)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    reference_server = ip.MulPirServer(parameter, ctx, [processed])
    batched_server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    indices = [0, 13, 23]
    queries = [client.generate_query([i], sk) for i in indices]
    responses = batched_server.compute_response_batch(queries, ek)
    for i, (index, query) in enumerate(zip(indices, queries)):
        got = client.decrypt(responses[i], [index], sk)
        assert got[0][:1] == database[index]
        ref = reference_server.compute_response(query, ek)
        for ref_reply, got_reply in zip(ref.ciphertexts, responses[i].ciphertexts):
            for rc, gc in zip(ref_reply, got_reply):
                for rp, gp in zip(rc.polys, gc.polys):
                    assert (np.asarray(rp.data) == np.asarray(gp.data)).all()


def test_compute_response_stream_matches_batches(setup):
    """Pipelined multi-batch serving returns the same responses as
    batch-at-a-time calls (and in order)."""
    ctx, sk, parameter, database, processed, client, ek = setup
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    batches = [
        [client.generate_query([1], sk), client.generate_query([4], sk)],
        [client.generate_query([7], sk), client.generate_query([9], sk)],
    ]
    streamed = server.compute_response_stream(batches, ek)
    assert len(streamed) == 4
    expected_indices = [1, 4, 7, 9]
    for r, i in zip(streamed, expected_indices):
        got = client.decrypt(r, [i], sk)
        assert got[0][:2] == database[i]
    # bit-identical to the per-batch path
    per_batch = [
        r for batch in batches for r in server.compute_response_batch(batch, ek)
    ]
    for a, b in zip(streamed, per_batch):
        for ra, rb in zip(a.ciphertexts[0], b.ciphertexts[0]):
            for pa, pb in zip(ra.polys, rb.polys):
                assert (np.asarray(pa.data) == np.asarray(pb.data)).all()

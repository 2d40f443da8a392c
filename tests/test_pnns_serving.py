"""Batched PNNS serving matches the reference-path server's scores."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pnns import pnns, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


def test_batched_pnns_matches_reference():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    dim, db_rows = 2, 4
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    pt_dims = pnns.MatrixDimensions(db_rows, dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, 1)
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config, pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim))
    )
    rng = np.random.default_rng(5)
    vectors = rng.standard_normal((db_rows, dim)).astype(np.float32)
    db = pnns.Database([pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)])
    processed = pnns.process_database(db, server_config)
    client = pnns.Client(client_config)
    sk = client.generate_secret_key(det_rng(b"s"))
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))

    q_vecs = rng.standard_normal((3, 1, dim)).astype(np.float32)
    queries = [client.generate_query(v, sk, err_rng=det_rng(bytes([i]))) for i, v in enumerate(q_vecs)]

    reference_server = pnns.Server(processed)
    batched_server = serving.BatchedPnnsServer(processed)
    batch_responses = batched_server.compute_response_batch(queries, ek)
    for i, query in enumerate(queries):
        ref_response = reference_server.compute_response(query, ek)
        ref_distances, _, _ = client.decrypt(ref_response, sk)
        got_distances, _, _ = client.decrypt(batch_responses[i], sk)
        assert np.allclose(np.asarray(got_distances).ravel(), np.asarray(ref_distances).ravel()), i


@pytest.mark.parametrize("staged", [False, True])
def test_batched_pnns_w64_matches_reference(staged, monkeypatch):
    """2-limb (w64) batched serving: bit-parity with the reference-path
    server (reference PnnsBenchmark covers Bfv<UInt64> too,
    PnnsBenchmark.swift:22-28). Covers both the eager-vmap default (CPU)
    and the staged pipeline (default on accelerator backends)."""
    if staged:
        monkeypatch.setenv("SHE_TPU_STAGED_SERVING", "1")
    ep = paramsmod.from_predefined("insecure_n_512_logq_4x60_logt_20", 64)
    ctx = bfv.get_bfv_context(ep)
    assert ctx.ciphertext_context.nlimbs == 2
    dim, db_rows = 4, 8
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    pt_dims = pnns.MatrixDimensions(db_rows, dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, 1)
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config, pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim))
    )
    rng = np.random.default_rng(7)
    vectors = rng.standard_normal((db_rows, dim)).astype(np.float32)
    db = pnns.Database([pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)])
    processed = pnns.process_database(db, server_config)
    client = pnns.Client(client_config)
    sk = client.generate_secret_key(det_rng(b"s"))
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    q_vecs = rng.standard_normal((2, 1, dim)).astype(np.float32)
    queries = [
        client.generate_query(v, sk, err_rng=det_rng(bytes([i])))
        for i, v in enumerate(q_vecs)
    ]
    reference_server = pnns.Server(processed)
    batched_server = serving.BatchedPnnsServer(processed)
    batch_responses = batched_server.compute_response_batch(queries, ek)
    for i, query in enumerate(queries):
        ref_response = reference_server.compute_response(query, ek)
        ref_distances, _, _ = client.decrypt(ref_response, sk)
        got_distances, _, _ = client.decrypt(batch_responses[i], sk)
        assert np.allclose(
            np.asarray(got_distances).ravel(), np.asarray(ref_distances).ravel()
        ), i

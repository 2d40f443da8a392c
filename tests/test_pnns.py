"""PNNS tests: matrix packing round trips, BSGS matmul vs plaintext,
end-to-end cosine similarity (analogues of PlaintextMatrixTests,
MatrixMultiplicationTests, CosineSimilarityTests)."""

import math

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pnns import pnns
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(616)


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def ctx():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    return bfv.get_bfv_context(ep)


@pytest.mark.parametrize(
    "packing_kind,rows,cols",
    [
        ("denseRow", 2, 3),
        ("denseRow", 5, 2),
        ("denseRow", 1, 4),
        ("denseColumn", 2, 3),
        ("denseColumn", 4, 2),
        ("diagonal", 3, 3),
        ("diagonal", 5, 2),
        ("diagonal", 4, 4),
    ],
)
def test_matrix_pack_unpack(ctx, packing_kind, rows, cols):
    t = ctx.plaintext_modulus
    dims = pnns.MatrixDimensions(rows, cols)
    if packing_kind == "diagonal":
        packing = pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(cols))
    elif packing_kind == "denseRow":
        packing = pnns.MatrixPacking.dense_row()
    else:
        packing = pnns.MatrixPacking.dense_column()
    values = [int(v) for v in RNG.integers(0, t, size=dims.count)]
    m = pnns.PlaintextMatrix.from_values(ctx, dims, packing, values)
    assert m.unpack() == values


def test_matrix_signed_roundtrip(ctx):
    t = ctx.plaintext_modulus
    dims = pnns.MatrixDimensions(3, 2)
    lo, hi = -(t >> 1), (t - 1) >> 1
    values = [int(v) for v in RNG.integers(lo, hi + 1, size=dims.count)]
    m = pnns.PlaintextMatrix.from_signed_values(
        ctx, dims, pnns.MatrixPacking.dense_row(), values
    )
    assert m.unpack_signed() == values


def test_matrix_encrypt_decrypt(ctx):
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    dims = pnns.MatrixDimensions(2, 3)
    values = [int(v) for v in RNG.integers(0, t, size=dims.count)]
    m = pnns.PlaintextMatrix.from_values(ctx, dims, pnns.MatrixPacking.dense_row(), values)
    ct = m.encrypt(sk, err_rng=det_rng(b"e"))
    assert ct.decrypt(sk).unpack() == values


def _mulmat_setup(ctx, db_rows, dim, queries):
    t = ctx.plaintext_modulus
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    pt_dims = pnns.MatrixDimensions(db_rows, dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, queries)
    ek = keys.generate_evaluation_key(ctx, ek_config, sk, det_rng(b"k"))
    return t, sk, pt_dims, ek


@pytest.mark.parametrize("db_rows,dim,queries", [(2, 2, 1), (4, 2, 1), (2, 4, 2), (3, 2, 2)])
def test_bsgs_mul_transpose(ctx, db_rows, dim, queries):
    t, sk, pt_dims, ek = _mulmat_setup(ctx, db_rows, dim, queries)
    db_vals = [int(v) for v in RNG.integers(0, t, size=pt_dims.count)]
    pt_matrix = pnns.PlaintextMatrix.from_values(
        ctx, pt_dims, pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim)), db_vals
    )
    q_dims = pnns.MatrixDimensions(queries, dim)
    q_vals = [int(v) for v in RNG.integers(0, t, size=q_dims.count)]
    q_matrix = pnns.PlaintextMatrix.from_values(
        ctx, q_dims, pnns.MatrixPacking.dense_row(), q_vals
    )
    ct = q_matrix.encrypt(sk, err_rng=det_rng(b"e")).to_coeff()
    result = pnns.mul_transpose_matrix(pt_matrix, ct, ek)
    got = result.decrypt(sk).unpack()
    db = np.array(db_vals).reshape(db_rows, dim)
    q = np.array(q_vals).reshape(queries, dim)
    expected = (db @ q.T) % t  # [db_rows, queries]
    assert got == [int(v) for v in expected.reshape(-1)]


def test_pnns_end_to_end(ctx):
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    dim = 2
    db_rows = 2
    queries = 1
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    ep = ctx.params
    pt_dims = pnns.MatrixDimensions(db_rows, dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, queries)
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config,
        pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim)),
    )
    vectors = np.array([[1.0, 0.0], [0.6, 0.8]], dtype=np.float32)
    db = pnns.Database(
        [pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)]
    )
    processed = pnns.process_database(db, server_config)
    server = pnns.Server(processed)
    client = pnns.Client(client_config)
    ek = keys.generate_evaluation_key(ctx, ek_config, sk, det_rng(b"k"))
    query_vec = np.array([[0.8, 0.6]], dtype=np.float32)
    query = client.generate_query(query_vec, sk, err_rng=det_rng(b"q"))
    response = server.compute_response(query, ek)
    assert response.noise_budget(sk) > 0
    distances, entry_ids, metadatas = client.decrypt(response, sk)
    # fixed-point cosine similarity reference
    def fp_cosine(a, b):
        an = a / np.linalg.norm(a)
        bn = b / np.linalg.norm(b)
        ar = np.round(an * sf)
        br = np.round(bn * sf)
        return float(ar @ br) / (sf * sf)

    for i in range(db_rows):
        expected = fp_cosine(vectors[i], query_vec[0])
        assert abs(float(distances[i, 0]) - expected) < 1e-6, (i, distances, expected)
    assert entry_ids == [0, 1]


def test_pnns_plaintext_crt(ctx):
    """Two plaintext moduli via CRT widen the score precision."""
    ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_16", 32)
    # use a small-degree insecure set instead for speed: construct manually
    from she_tpu import params as pm

    base = pm.EncryptionParameters(
        poly_degree=8,
        plaintext_modulus=17,
        coefficient_moduli=(131249, 131297, 131441, 131489, 131617),
        security_level=pm.SecurityLevel.UNCHECKED,
        scalar_bits=32,
    )
    dim = 2
    sf = pnns.max_scaling_factor(dim, [17, 97])
    ek_config = pnns.matmul_evaluation_key_config(
        bfv.get_bfv_context(base), pnns.MatrixDimensions(2, dim), 1
    )
    client_config = pnns.ClientConfig.create(
        base, sf, pnns.MatrixPacking.dense_row(), dim, ek_config, extra_plaintext_moduli=(97,)
    )
    server_config = pnns.ServerConfig(
        client_config, pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim))
    )
    vectors = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    db = pnns.Database([pnns.DatabaseRow(i, b"", vectors[i]) for i in range(2)])
    processed = pnns.process_database(db, server_config)
    client = pnns.Client(client_config)
    sk = client.generate_secret_key(det_rng(b"s"))
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    query = client.generate_query(np.array([[1.0, 0.0]], dtype=np.float32), sk, err_rng=det_rng(b"q"))
    server = pnns.Server(processed)
    response = server.compute_response(query, ek)
    distances, _, _ = client.decrypt(response, sk)
    assert abs(float(distances[0, 0]) - 1.0) < 1e-5
    assert abs(float(distances[1, 0])) < 1e-5


def test_pnns_validate_database(ctx):
    """validate_database runs fresh-key trials vs the fixed-point reference
    (ProcessedDatabase.swift:93-160)."""
    dim = 2
    db_rows = 3
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    ek_config = pnns.matmul_evaluation_key_config(
        ctx, pnns.MatrixDimensions(db_rows, dim), 1
    )
    client_config = pnns.ClientConfig.create(
        ctx.params, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config,
        pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim)),
    )
    vectors = np.array(
        [[1.0, 0.0], [0.6, 0.8], [-0.7, 0.7]], dtype=np.float32
    )
    db = pnns.Database(
        [pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)]
    )
    processed = pnns.process_database(db, server_config)
    result = pnns.validate_database(processed, trials=2)
    assert result.noise_budget > 0
    assert result.max_abs_error < 1e-6
    assert result.query_time_s > 0 and result.response_time_s > 0

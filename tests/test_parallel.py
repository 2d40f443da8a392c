"""Multi-device sharded serving on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.parallel import mesh as meshmod
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
        entry_count=16, entry_size_in_bytes=1, dimension_count=2, batch_size=1,
        uneven_dimensions=False, key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(3)
    database = [bytes([int(v)]) for v in rng.integers(0, 256, size=16)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    return ctx, sk, parameter, database, processed, client, ek


def test_batch_parallel_response(setup):
    ctx, sk, parameter, database, processed, client, ek = setup
    assert len(jax.devices()) >= 8
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    m = meshmod.make_mesh(8, "batch")
    indices = [int(i) % 16 for i in range(8)]
    queries = [client.generate_query([i], sk) for i in indices]
    responses = meshmod.batch_parallel_response(server, queries, ek, m)
    for r, i in zip(responses, indices):
        got = client.decrypt(r, [i], sk)
        assert got[0][:1] == database[i]


def test_dim0_partial_psum_matches_single_device(setup):
    ctx, sk, parameter, database, processed, client, ek = setup
    ct_ctx = ctx.ciphertext_context
    d0 = parameter.dimensions[0]
    n_chunks = ip.chunk_count(parameter, ctx)
    per_chunk = processed.count // n_chunks
    chunk = jnp.asarray(
        serving.pack_database_chunk(processed.plaintexts[:per_chunk], d0, ct_ctx)
    )
    query = client.generate_query([3], sk)
    expanded = ip.expand(query.ciphertexts, parameter.expanded_query_count, ek)
    dim0 = [bfv.ct_to_eval(c) for c in expanded[:d0]]
    query_eval = jnp.stack(
        [jnp.stack([c.polys[0].data, c.polys[1].data]) for c in dim0]
    )
    single = serving.dim0_inner_products(chunk, query_eval, ct_ctx)
    # partition d0 over as many devices as divide it
    S = 4 if d0 % 4 == 0 else (2 if d0 % 2 == 0 else 1)
    if S == 1:
        pytest.skip(f"d0={d0} not divisible by mesh")
    m = meshmod.make_mesh(S, "db")
    sharded = meshmod.dim0_partial_psum(chunk, query_eval, ct_ctx, m)
    assert (np.asarray(sharded) == np.asarray(single)).all()


def test_dim0_partial_psum_w64():
    """The w64 (2-limb) database-partitioned reduction is exact: the u32
    psum shortcut can't carry across limbs, so the butterfly modular-add
    path must produce bit-identical results to single-device."""
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 64)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    config = ip.IndexPirConfig(
        entry_count=16, entry_size_in_bytes=1, dimension_count=2, batch_size=1,
        uneven_dimensions=False, key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(7)
    database = [bytes([int(v)]) for v in rng.integers(0, 256, size=16)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    ct_ctx = ctx.ciphertext_context
    assert ct_ctx.nlimbs == 2
    d0 = parameter.dimensions[0]
    n_chunks = ip.chunk_count(parameter, ctx)
    per_chunk = processed.count // n_chunks
    chunk = jnp.asarray(
        serving.pack_database_chunk(processed.plaintexts[:per_chunk], d0, ct_ctx)
    )
    query = client.generate_query([5], sk)
    expanded = ip.expand(query.ciphertexts, parameter.expanded_query_count, ek)
    dim0 = [bfv.ct_to_eval(c) for c in expanded[:d0]]
    query_eval = jnp.stack(
        [jnp.stack([c.polys[0].data, c.polys[1].data]) for c in dim0]
    )
    single = serving.dim0_inner_products(chunk, query_eval, ct_ctx)
    S = 4 if d0 % 4 == 0 else (2 if d0 % 2 == 0 else 1)
    if S == 1:
        pytest.skip(f"d0={d0} not divisible by mesh")
    m = meshmod.make_mesh(S, "db")
    sharded = meshmod.dim0_partial_psum(chunk, query_eval, ct_ctx, m)
    assert (np.asarray(sharded) == np.asarray(single)).all()


def test_batch_parallel_pnns_response():
    """PNNS query-batch SPMD: sharded results match the unsharded server."""
    import numpy as np

    from she_tpu.bfv import keys
    from she_tpu.pnns import pnns
    from she_tpu.pnns import serving as pnns_serving
    from she_tpu.parallel import mesh as meshmod

    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    dim = 2
    db_rows = 3
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    ek_config = pnns.matmul_evaluation_key_config(
        ctx, pnns.MatrixDimensions(db_rows, dim), 1
    )
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config,
        pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim)),
    )
    rng = np.random.default_rng(3)
    vectors = rng.standard_normal((db_rows, dim)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    db = pnns.Database(
        [pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)]
    )
    processed = pnns.process_database(db, server_config)
    client = pnns.Client(client_config)
    ek = keys.generate_evaluation_key(ctx, ek_config, sk, det_rng(b"k"))
    server = pnns_serving.BatchedPnnsServer(processed)
    B = 8
    queries = [
        client.generate_query(
            rng.standard_normal((1, dim)).astype(np.float32),
            sk,
            err_rng=det_rng(bytes([i])),
        )
        for i in range(B)
    ]
    expected = server.compute_response_batch(queries, ek)
    m = meshmod.make_mesh(8)
    got = meshmod.batch_parallel_pnns_response(server, queries, ek, m)
    for e, g in zip(expected, got):
        for em, gm in zip(e.ciphertext_matrices, g.ciphertext_matrices):
            for ec, gc in zip(em.ciphertexts, gm.ciphertexts):
                for epoly, gpoly in zip(ec.polys, gc.polys):
                    assert (np.asarray(epoly.data) == np.asarray(gpoly.data)).all()


def test_two_axis_response_bit_equal(setup):
    """One shard_map serving program on a (batch, db) mesh: query batch
    data-parallel x database-contraction tensor-parallel, bit-identical to
    the single-device batched server (VERDICT r4 #5)."""
    ctx, sk, parameter, database, processed, client, ek = setup
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = jax.sharding.Mesh(devices, ("batch", "db"))
    indices = [int(i) % 16 for i in range(4)]
    queries = [client.generate_query([i], sk) for i in indices]

    out = meshmod.two_axis_response(server, queries, ek, mesh)
    stacked, n_ct, indices_count = server.stack_queries(queries)
    expect = server._respond_arrays(stacked, ek, len(queries), n_ct, indices_count)
    assert len(out) == len(expect) == 1
    assert len(out[0]) == len(expect[0])
    for got_chunk, exp_chunk in zip(out[0], expect[0]):
        assert (np.asarray(got_chunk) == np.asarray(exp_chunk)).all()

    # and the responses decrypt correctly
    responses = server._assemble_responses(out, len(queries))
    for r, i in zip(responses, indices):
        got = client.decrypt(r, [i], sk)
        assert got[0][:1] == database[i]

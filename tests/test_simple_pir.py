"""SimplePIR end-to-end tests (analogue of SimplePirTests)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.pir import simple_pir as sp
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(8080)


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


def make_params(p_bits=4, b_bits=16, n=16):
    return sp.SimplePirEncryptionParams(
        plaintext_modulus_bits=p_bits,
        ciphertext_modulus_bits=b_bits,
        lattice_dimension=n,
        security_level=paramsmod.SecurityLevel.UNCHECKED,
    )


def test_params_validation():
    with pytest.raises(Exception):
        sp.SimplePirEncryptionParams(8, 8, 16, security_level=paramsmod.SecurityLevel.UNCHECKED)
    with pytest.raises(Exception):
        sp.SimplePirEncryptionParams(4, 16, 15, security_level=paramsmod.SecurityLevel.UNCHECKED)
    # secure config accepted: n=1024 supports <= 21 bits
    sp.SimplePirEncryptionParams(9, 21, 1024)
    with pytest.raises(Exception):
        sp.SimplePirEncryptionParams(9, 32, 1024)


def test_computing_params_square():
    ep = make_params()
    p = sp.computing_params(ep, entry_count=100, entry_size_in_bytes=4, seed=bytes(32))
    assert p.entries_per_column == 1 or p.chunks_per_entry == 1
    assert p.database_columns >= 1
    assert p.entry_size_in_scalar == 8  # 4 bytes at 4 bits/coeff


def test_a_matrix_negacyclic_structure():
    ep = make_params()
    params = sp.computing_params(ep, 40, 2, seed=bytes(32))
    ctx = sp.SimplePirContext(params)
    polys = ctx.generate_a_polynomials()
    A = ctx.materialize_a_matrix(polys)
    assert A.shape == (params.database_columns, ep.lattice_dimension)
    # A * s == coefficients of p*s for the first block
    n = ep.lattice_dimension
    q = ctx.ntt_friendly_mod
    s = np.array([int(v) % q for v in RNG.integers(0, q, size=n)], dtype=object)
    direct = (A[:n] @ s) % q
    # negacyclic product reference
    pc = polys[0].to_values()[0]
    expected = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            sign = 1
            if k >= n:
                k -= n
                sign = -1
            expected[k] = (expected[k] + sign * int(pc[i]) * int(s[j])) % q
    assert (direct == expected).all()


@pytest.mark.parametrize("entry_count,entry_size", [(20, 3), (8, 1), (5, 40)])
def test_simple_pir_end_to_end(entry_count, entry_size):
    ep = make_params()
    entries = [bytes(RNG.integers(0, 256, size=entry_size).tolist()) for _ in range(entry_count)]
    results = sp.process_database(entries, ep, seed=bytes(32))
    server = sp.SimplePirServer(results.database, results.hint, results.params)
    client = sp.SimplePirClient(results.params, results.hint)
    for index in [0, entry_count // 2, entry_count - 1]:
        q = client.query(index, rng=det_rng(bytes([index])))
        prepared = q.prepare_response()
        responses = server.compute_response(q.queries)
        got = client.decrypt(responses, prepared, index)
        assert got == entries[index], f"index {index}"


def test_simple_pir_precomputed_queries_reusable():
    """Offline precomputation then online index binding."""
    ep = make_params()
    entries = [bytes([i, 2 * i % 256]) for i in range(10)]
    results = sp.process_database(entries, ep, seed=bytes(32))
    server = sp.SimplePirServer(results.database, results.hint, results.params)
    client = sp.SimplePirClient(results.params, results.hint)
    offline = client.precompute_query(rng=det_rng(b"o"))
    q = offline.add(7)
    prepared = q.prepare_response()
    responses = server.compute_response(q.queries)
    assert client.decrypt(responses, prepared, 7) == entries[7]


def test_database_map_sharding_roundtrip():
    import random

    entries = [(i, bytes([i] * (3 + i % 5))) for i in range(12)]
    dmap, shards = sp.DatabaseMap.shard_database(
        entries, shard_count=3, chunk_size=4, rng=random.Random(9)
    )
    # every chunk is addressable and reconstructs the value
    for entry in dmap.entries:
        original = dict(entries)[entry.original_index]
        data = b""
        for chunk in entry.chunks:
            data += shards[chunk.shard_index][chunk.index]
        assert data[: entry.size] == original


def test_simple_pir_all_shards_client():
    import random

    ep = make_params()
    entries = [(i, bytes([i, i + 1, i + 2, i + 3, i + 4])) for i in range(10)]
    dmap, shard_chunks = sp.DatabaseMap.shard_database(
        entries, shard_count=2, chunk_size=3, rng=random.Random(4)
    )
    servers, clients = [], []
    for chunks in shard_chunks:
        results = sp.process_database(chunks, ep, seed=bytes(32))
        servers.append(sp.SimplePirServer(results.database, results.hint, results.params))
        clients.append(sp.SimplePirClient(results.params, results.hint))
    all_client = sp.SimplePirClientForAllShards(dmap, clients)
    for index in [0, 5, 9]:
        queries = all_client.query(index, rng=det_rng(bytes([index])))
        responses = [
            [servers[s].compute_response(q.queries) for q in per_shard]
            for s, per_shard in enumerate(queries)
        ]
        got = all_client.decrypt(responses, index, queries)
        assert got == dict(entries)[index], index
    assert all_client.decrypt(responses, 99, queries) is None

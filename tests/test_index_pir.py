"""MulPIR end-to-end tests (analogue of ExpansionTests + IndexPIR tests)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pir import index_pir as ip
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(4242)


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def ctx_sk():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    return ctx, sk


def test_expansion_roundtrip(ctx_sk):
    """Expanded ciphertexts decrypt to the original binary array
    (ExpansionTests equivalent)."""
    ctx, sk = ctx_sk
    n = ctx.degree
    t = ctx.plaintext_modulus
    for output_count in [1, 2, 3, 5, 8]:
        one_indices = sorted(
            set(int(v) for v in RNG.integers(0, output_count, size=max(1, output_count // 2)))
        )
        cts = ip.compress_binary_inputs(output_count, one_indices, ctx, sk)
        ek_config = ip.evaluation_key_config(output_count, n, ip.PirKeyCompression.NO_COMPRESSION)
        ek = keys.generate_evaluation_key(ctx, ek_config, sk, det_rng(b"k"))
        expanded = ip.expand(cts, output_count, ek)
        assert len(expanded) == output_count
        for i, ct in enumerate(expanded):
            vals = bfv.decode(ctx, bfv.decrypt(ct, sk))
            expected = [1 if i in one_indices else 0] + [0] * (n - 1)
            assert vals == expected, f"output {i} (count {output_count})"


@pytest.mark.parametrize("key_compression", list(ip.PirKeyCompression))
def test_expansion_key_compression(ctx_sk, key_compression):
    ctx, sk = ctx_sk
    n = ctx.degree
    output_count = 6
    one_indices = [1, 4]
    cts = ip.compress_binary_inputs(output_count, one_indices, ctx, sk)
    ek_config = ip.evaluation_key_config(output_count, n, key_compression)
    ek = keys.generate_evaluation_key(ctx, ek_config, sk, det_rng(b"k"))
    expanded = ip.expand(cts, output_count, ek)
    for i, ct in enumerate(expanded):
        vals = bfv.decode(ctx, bfv.decrypt(ct, sk))
        expected = [1 if i in one_indices else 0] + [0] * (n - 1)
        assert vals == expected


@pytest.mark.parametrize("dimension_count", [1, 2])
@pytest.mark.parametrize("entry_size", [1, 3])
def test_mulpir_end_to_end(ctx_sk, dimension_count, entry_size):
    ctx, sk = ctx_sk
    entry_count = 10
    config = ip.IndexPirConfig(
        entry_count=entry_count,
        entry_size_in_bytes=entry_size,
        dimension_count=dimension_count,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    database = [bytes(RNG.integers(0, 256, size=entry_size).tolist()) for _ in range(entry_count)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    server = ip.MulPirServer(parameter, ctx, [processed])
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    for index in [0, 3, entry_count - 1]:
        query = client.generate_query([index], sk)
        response = server.compute_response(query, ek)
        result = client.decrypt(response, [index], sk)
        assert result[0][: len(database[index])] == database[index], f"index {index}"


def test_mulpir_batched_query(ctx_sk):
    ctx, sk = ctx_sk
    entry_count = 8
    config = ip.IndexPirConfig(
        entry_count=entry_count,
        entry_size_in_bytes=2,
        dimension_count=2,
        batch_size=2,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    database = [bytes([i, 255 - i]) for i in range(entry_count)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    server = ip.MulPirServer(parameter, ctx, [processed])
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    indices = [2, 6]
    query = client.generate_query(indices, sk)
    response = server.compute_response(query, ek)
    result = client.decrypt(response, indices, sk)
    for got, idx in zip(result, indices):
        assert got[:2] == database[idx]


def test_mulpir_large_entries_split(ctx_sk):
    """Entries larger than bytesPerPlaintext use the split path."""
    ctx, sk = ctx_sk
    entry_count = 4
    entry_size = 9  # > 4 bytes/plaintext
    config = ip.IndexPirConfig(
        entry_count=entry_count,
        entry_size_in_bytes=entry_size,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    database = [bytes(RNG.integers(0, 256, size=entry_size).tolist()) for _ in range(entry_count)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    server = ip.MulPirServer(parameter, ctx, [processed])
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    for index in range(entry_count):
        query = client.generate_query([index], sk)
        response = server.compute_response(query, ek)
        result = client.decrypt(response, [index], sk)
        assert result[0][:entry_size] == database[index]


def test_mulpir_encoded_entry_size(ctx_sk):
    """Variable-size entries with encoded sizes."""
    ctx, sk = ctx_sk
    entries = [b"a", b"bc", b"", b"d"]
    config = ip.IndexPirConfig(
        entry_count=len(entries),
        entry_size_in_bytes=2,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
        encoding_entry_size=True,
    )
    parameter = ip.generate_parameter(config, ctx)
    processed = ip.MulPirServer.process(entries, ctx, parameter)
    server = ip.MulPirServer(parameter, ctx, [processed])
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    for index, expected in enumerate(entries):
        query = client.generate_query([index], sk)
        response = server.compute_response(query, ek)
        result = client.decrypt(response, [index], sk)
        assert result[0] == expected


def test_processed_database_serialization(ctx_sk):
    ctx, sk = ctx_sk
    config = ip.IndexPirConfig(entry_count=6, entry_size_in_bytes=2, dimension_count=2, batch_size=1,
                               uneven_dimensions=True, key_compression=ip.PirKeyCompression.NO_COMPRESSION)
    parameter = ip.generate_parameter(config, ctx)
    database = [bytes([i, i + 1]) for i in range(6)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    data = processed.serialize(ctx)
    loaded = ip.ProcessedDatabase.deserialize(data, ctx)
    assert loaded.count == processed.count
    for a, b in zip(loaded.plaintexts, processed.plaintexts):
        if a is None:
            assert b is None
        else:
            assert (np.asarray(a.poly.data) == np.asarray(b.poly.data)).all()

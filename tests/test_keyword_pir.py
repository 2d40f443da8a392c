"""Keyword PIR: cuckoo tables, hash buckets, sharding, end-to-end lookup."""

import random

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import keyword_pir as kp
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(31337)


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


def test_hash_bucket_roundtrip():
    slots = [(kp.keyword_hash(b"alpha"), b"value-1"), (kp.keyword_hash(b"beta"), b"")]
    bucket = kp.HashBucket(slots)
    data = bucket.serialize()
    back = kp.HashBucket.deserialize(data)
    assert back.slots == slots
    assert back.find(kp.keyword_hash(b"alpha")) == b"value-1"
    assert back.find(kp.keyword_hash(b"gamma")) is None
    assert bucket.serialized_size() == len(data)


def test_hash_indices_unique():
    idx = kp.hash_indices(b"some keyword", 17, 2)
    assert len(idx) == 2
    assert len(set(idx)) == 2
    assert all(0 <= i < 17 for i in idx)
    # deterministic
    assert idx == kp.hash_indices(b"some keyword", 17, 2)


def test_cuckoo_table_insert_and_get():
    rows = {f"key{i}".encode(): f"value{i}".encode() for i in range(50)}
    config = kp.CuckooTableConfig.default_keyword_pir(max_serialized_bucket_size=64)
    table = kp.CuckooTable(config, rows.items(), rng=random.Random(1))
    assert table.entry_count == 50
    for kw, val in rows.items():
        assert table.get(kw) == val
    assert table.get(b"missing") is None
    info = table.summarize()
    assert info["entryCount"] == 50
    assert info["bucketCount"] == len(table.buckets)


def test_cuckoo_duplicate_keyword_ignored():
    config = kp.CuckooTableConfig.default_keyword_pir(max_serialized_bucket_size=64)
    table = kp.CuckooTable(config, [(b"k", b"v1"), (b"k", b"v2")], rng=random.Random(1))
    assert table.entry_count == 1
    assert table.get(b"k") == b"v1"


def test_sharding():
    rows = {f"key{i}".encode(): b"v" for i in range(100)}
    shards = kp.shard_database(rows, kp.Sharding("shardCount", 4))
    assert sum(len(s) for s in shards.values()) == 100
    # stable assignment
    for sid, shard in shards.items():
        for kw in shard:
            assert str(kp.shard_index_sha256(kw, 4)) == sid
    by_count = kp.shard_database(rows, kp.Sharding("entryCountPerShard", 25))
    assert sum(len(s) for s in by_count.values()) == 100


def test_double_mod_sharding():
    fn = kp.ShardingFunction("doubleMod", other_shard_count=8)
    for kw in [b"a", b"b", b"c"]:
        assert fn.shard_index(kw, 4) == kp.shard_index_sha256(kw, 8) % 4


@pytest.fixture(scope="module")
def ctx_sk():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    return ctx, sk


def test_keyword_pir_end_to_end(ctx_sk):
    ctx, sk = ctx_sk
    rows = [(f"kw{i}".encode(), bytes([i, i + 1])) for i in range(12)]
    bucket_size = kp.default_max_serialized_bucket_size(2, ctx.params.bytes_per_plaintext)
    config = kp.KeywordPirConfig(
        dimension_count=2,
        cuckoo_table_config=kp.CuckooTableConfig.default_keyword_pir(bucket_size),
    )
    processed = kp.KeywordPirServer.process(rows, config, ctx, rng=random.Random(7))
    server = kp.KeywordPirServer(ctx, processed)
    client = kp.KeywordPirClient(
        processed.keyword_pir_parameter, processed.pir_parameter, ctx
    )
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    for kw, val in rows[:5]:
        query = client.generate_query(kw, sk)
        response = server.compute_response(query, ek)
        got = client.decrypt(response, kw, sk)
        assert got == val, kw
    # absent keyword
    query = client.generate_query(b"absent!", sk)
    response = server.compute_response(query, ek)
    assert client.decrypt(response, b"absent!", sk) is None
    # privacy diagnostic counts at most slot entries
    assert client.count_entries_in_response(response, sk) >= 0

"""MMapDictionary, NoOpScheme, ProcessKeywordDatabase, and CLI e2e tests
(analogues of MMapDictionary tests, NoOpScheme API tests,
ProcessDatabaseTests, and ci/check-pir-process-db.sh)."""

import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, noop
from she_tpu.io import mmap_dict
from she_tpu.pir import keyword_pir as kp, process_database as pdb
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

RNG = np.random.default_rng(4096)


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


# --- MMapDictionary ---------------------------------------------------------


def test_mmap_dictionary_roundtrip(tmp_path):
    builder = mmap_dict.MMapDictionaryBuilder()
    rows = {f"key-{i}".encode(): f"value-{i}".encode() for i in range(100)}
    for k, v in rows.items():
        builder.insert(k, v)
    path = str(tmp_path / "dict.mmap")
    builder.write(path)
    d = mmap_dict.MMapDictionary(path)
    assert d.count() == 100
    for k, v in rows.items():
        assert d.get(k) == v
    assert d.get(b"missing") is None
    assert d.longest_probe_run() >= 1
    assert dict(d.items()) == rows
    d.close()


def test_mmap_dictionary_format():
    builder = mmap_dict.MMapDictionaryBuilder()
    builder.insert(b"k", b"v")
    data = builder.build()
    # magic "MMAP" little-endian, at least 16 buckets
    assert data[:4] == (0x4D4D4150).to_bytes(4, "little")
    assert int.from_bytes(data[4:8], "little") >= 16
    d = mmap_dict.MMapDictionary(data)
    assert d.get(b"k") == b"v"


def test_mmap_empty_value_and_binary_keys():
    builder = mmap_dict.MMapDictionaryBuilder()
    builder.insert(b"\x00\xff", b"")
    builder.insert(b"", b"x")
    d = mmap_dict.MMapDictionary(builder.build())
    assert d.get(b"\x00\xff") == b""
    assert d.get(b"") == b"x"


# --- NoOpScheme -------------------------------------------------------------


def test_noop_scheme():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    t = ctx.plaintext_modulus
    v1 = [int(v) for v in RNG.integers(0, t, size=ctx.degree)]
    v2 = [int(v) for v in RNG.integers(0, t, size=ctx.degree)]
    sk = noop.generate_secret_key(ctx)
    ct1 = noop.encrypt(bfv.encode(ctx, v1), sk)
    ct2 = noop.encrypt(bfv.encode(ctx, v2), sk)
    assert bfv.decode(ctx, noop.decrypt(ct1, sk)) == v1
    assert bfv.decode(ctx, noop.decrypt(noop.ct_add(ct1, ct2), sk)) == [
        (a + b) % t for a, b in zip(v1, v2)
    ]
    assert bfv.decode(ctx, noop.decrypt(noop.ct_neg(ct1), sk)) == [(-a) % t for a in v1]
    prod = noop.ct_mul(ct1, ct2)
    from tests.test_bfv_mul import negacyclic_product

    assert bfv.decode(ctx, noop.decrypt(prod, sk)) == negacyclic_product(v1, v2, t)
    assert noop.noise_budget(ct1) == float("inf")


# --- ProcessKeywordDatabase -------------------------------------------------


def test_process_keyword_database_with_validation():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    rows = {f"kw{i}".encode(): bytes([i]) for i in range(8)}
    config = pdb.KeywordDatabaseConfig(
        kp.Sharding("shardCount", 2),
        kp.KeywordPirConfig(
            dimension_count=2,
            cuckoo_table_config=kp.CuckooTableConfig.default_keyword_pir(
                kp.default_max_serialized_bucket_size(1, ep.bytes_per_plaintext)
            ),
        ),
    )
    arguments = pdb.Arguments(
        database_config=config, encryption_parameters=ep, trials_per_shard=1
    )
    processed = pdb.process(rows, arguments, rng=random.Random(5))
    assert 1 <= len(processed.shards) <= 2
    assert processed.evaluation_key_config.has_relinearization_key
    # validate one shard with a row that belongs to it
    shard_id, shard = next(iter(processed.shards.items()))
    n_shards = 2
    row = next(
        (kw, v)
        for kw, v in rows.items()
        if str(kp.shard_index_sha256(kw, n_shards)) == shard_id
    )
    result = pdb.validate_shard(shard, row, trials=1, context=ctx)
    assert result.noise_budget > 0
    assert result.query_size > 0 and result.response_size > 0
    assert len(result.compute_times) == 1


# --- CLI end-to-end (ci/check-pir-process-db.sh analogue) -------------------


def run_cli(module, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-m", f"she_tpu.cli.{module}", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    return result.stdout


def test_cli_pir_pipeline(tmp_path):
    db_path = str(tmp_path / "db.binpb")
    out = run_cli(
        "pir_generate_database",
        "--output-database", db_path,
        "--row-count", "10",
        "--value-size", "1",
    )
    assert "10 rows" in out

    # shard the database
    out = run_cli(
        "pir_shard_database",
        "--input-database", db_path,
        "--output-database", str(tmp_path / "shard-SHARD_ID.binpb"),
        "--shard-count", "2",
    )
    assert "Wrote shard" in out

    # full processing pipeline
    config = {
        "inputDatabase": db_path,
        "outputDatabase": str(tmp_path / "processed-SHARD_ID.bin"),
        "outputPirParameters": str(tmp_path / "params-SHARD_ID.binpb"),
        "outputEvaluationKeyConfig": str(tmp_path / "ekconfig.binpb"),
        "rlweParameters": "insecure_n_8_logq_5x18_logt_5",
        "sharding": {"shardCount": 1},
        "trialsPerShard": 1,
    }
    config_path = str(tmp_path / "config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)
    out = run_cli("pir_process_database", config_path)
    assert "noiseBudget" in out
    assert os.path.exists(str(tmp_path / "processed-0.bin"))
    assert os.path.exists(str(tmp_path / "params-0.binpb"))
    assert os.path.exists(str(tmp_path / "ekconfig.binpb"))

    # mmap tool over the same database
    mmap_path = str(tmp_path / "db.mmap")
    out = run_cli("mmap_tool", "dict", "--input-database", db_path, "--output", mmap_path)
    assert "10 entries" in out
    out = run_cli("mmap_tool", "info", mmap_path)
    assert "entries: 10" in out
    out = run_cli("mmap_tool", "get", mmap_path, "3")
    assert out.strip() != "not found"


def test_cli_pnns_pipeline(tmp_path):
    db_path = str(tmp_path / "pnns.binpb")
    run_cli(
        "pnns_generate_database",
        "--output-database", db_path,
        "--row-count", "4",
        "--vector-dimension", "2",
    )
    config = {
        "inputDatabase": db_path,
        "outputDatabase": str(tmp_path / "pnns-processed.binpb"),
        "rlweParameters": "insecure_n_8_logq_5x18_logt_5",
        "trialsPerShard": 1,
    }
    config_path = str(tmp_path / "pnns-config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)
    out = run_cli("pnns_process_database", config_path)
    assert "noise budget" in out and "max |error|" in out
    assert os.path.exists(config["outputDatabase"])


def test_cli_simple_pir_pipeline(tmp_path):
    db_path = str(tmp_path / "spir.binpb")
    run_cli(
        "pir_generate_database",
        "--output-database", db_path,
        "--row-count", "8",
        "--value-size", "2",
    )
    config = {
        "inputDatabase": db_path,
        "outputDatabase": str(tmp_path / "spir-db.npy"),
        "outputHint": str(tmp_path / "spir-hint.npy"),
        "outputParameters": str(tmp_path / "spir-params.binpb"),
        "plaintextModulusBits": 4,
        "ciphertextModulusBits": 16,
        "latticeDimension": 16,
        "securityLevel": "unchecked",
    }
    config_path = str(tmp_path / "spir-config.json")
    with open(config_path, "w") as f:
        json.dump(config, f)
    out = run_cli("simple_pir_process_database", config_path)
    assert "Wrote" in out
    assert os.path.exists(config["outputParameters"])


def test_zeroize_native():
    import numpy as np

    from she_tpu.utils.zeroize import zeroize
    from she_tpu.native import get_lib

    arr = np.arange(64, dtype=np.uint32)
    zeroize(arr)
    assert (arr == 0).all()
    buf = bytearray(b"secret key material")
    zeroize(buf)
    assert buf == bytearray(len(buf))
    assert get_lib() is not None  # toolchain is available in this image


def test_cli_warm_pir(capsys):
    # she-tpu-warm e2e at toy shapes: builds the serving programs, runs one
    # batch, asserts the warm-run decrypt check passed (exit 0)
    from she_tpu.cli import warm

    rc = warm.main(
        [
            "pir",
            "--params", "insecure_n_512_logq_4x60_logt_20",
            "--scalar-bits", "64",
            "--entries", "200",
            "--entry-size", "3",
            "--batch", "2",
        ]
    )
    assert rc == 0

"""PIR service envelope: full wire-level round trip."""

import random

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.io import pb, proto_conversion as pc
from she_tpu.pir import (
    keyword_pir as kp,
    process_database as pdb,
    service as svc,
    symmetric_pir as spir,
)
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def service_setup():
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
    arguments = pdb.Arguments(database_config=config, encryption_parameters=ep, trials_per_shard=0)
    processed = pdb.process(rows, arguments, rng=random.Random(5))
    service = svc.PirService()
    service.add_keyword_pir_usecase("test-db", ctx, processed)
    return ctx, rows, processed, service


def test_config_request(service_setup):
    ctx, rows, processed, service = service_setup
    req = pb.api_pb2.ConfigRequest()
    req.usecases.append("test-db")
    resp = service.handle_config_request(req)
    assert "test-db" in resp.configs
    cfg = resp.configs["test-db"].pir_config
    assert len(cfg.shard_configs) == len(processed.shards)
    assert cfg.keyword_pir_params.num_hash_functions == 2
    assert len(resp.configs["test-db"].config_id) == 32


def test_pir_request_roundtrip(service_setup):
    ctx, rows, processed, service = service_setup
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    req = pb.api_pb2.ConfigRequest()
    resp = service.handle_config_request(req)
    cfg = resp.configs["test-db"]
    config_hash = bytes(cfg.config_id)
    kw_params = None

    keyword = b"kw3"
    n_shards = len(processed.shards)
    shard_id = str(kp.shard_index_sha256(keyword, n_shards))
    shard = processed.shards[shard_id]
    client = kp.KeywordPirClient(shard.keyword_pir_parameter, shard.pir_parameter, ctx)
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))

    # upload the evaluation key
    keys_msg = pb.api_shared_pb2.EvaluationKeys()
    key_entry = keys_msg.keys.add()
    key_entry.metadata.timestamp = 123
    key_entry.metadata.identifier = b"client-1"
    key_entry.evaluation_key.CopyFrom(pc.evaluation_key_to_proto(ek))
    service.store_evaluation_keys(keys_msg, ctx)

    # wire-format request
    query = client.generate_query(keyword, sk)
    request = pb.api_pir_pb2.PIRRequest()
    request.query.CopyFrom(pc.pir_query_to_proto(query))
    request.evaluation_key_metadata.identifier = b"client-1"
    request.configuration_hash = config_hash
    request.shard_id = shard_id
    raw = request.SerializeToString()
    request2 = pb.api_pir_pb2.PIRRequest.FromString(raw)

    response_msg = service.handle_pir_request("test-db", request2)
    raw_resp = response_msg.SerializeToString()
    response2 = pb.api_pir_pb2.PIRResponse.FromString(raw_resp)
    response = pc.pir_response_from_proto(list(response2.replies), ctx)
    got = client.decrypt(response, keyword, sk)
    assert got == rows[keyword]


def test_pir_request_rejects_bad_hash(service_setup):
    ctx, rows, processed, service = service_setup
    request = pb.api_pir_pb2.PIRRequest()
    request.configuration_hash = b"\x00" * 32
    with pytest.raises(Exception):
        service.handle_pir_request("test-db", request)


def test_oprf_request():
    service = svc.PirService()
    config = spir.SymmetricPirConfig(bytes(47) + b"\x05")
    service.add_oprf_usecase(b"cfg1", config)
    client = spir.OprfClient(config.client_config())
    ctx_blind = client.query_context(b"keyword")
    req = pb.api_pir_pb2.OPRFRequest()
    req.query_element = ctx_blind.query
    req.config_id = b"cfg1"
    resp = service.handle_oprf_request(pb.api_pir_pb2.OPRFRequest.FromString(req.SerializeToString()))
    from she_tpu.pir import oprf

    evaluation = oprf.BlindEvaluation(bytes(resp.evaluated_element), bytes(resp.proof))
    parsed = client.parse(evaluation, ctx_blind)
    assert len(parsed.oblivious_keyword) == 16

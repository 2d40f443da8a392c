"""Protobuf wire format round trips (analogue of ConversionTests)."""

import numpy as np
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.io import pb, proto_conversion as pc, serialize as ser
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def det_rng(tag=b"x"):
    return nist_aes128_ctr((tag * 32)[:32])


@pytest.fixture(scope="module")
def ctx_sk():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det_rng(b"s"))
    return ctx, sk


def test_encryption_parameters_roundtrip():
    ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24")
    msg = pc.encryption_parameters_to_proto(ep)
    data = msg.SerializeToString()
    msg2 = pb.he_pb2.EncryptionParameters()
    msg2.ParseFromString(data)
    ep2 = pc.encryption_parameters_from_proto(msg2)
    assert ep2 == ep


def test_ciphertext_proto_roundtrip(ctx_sk):
    ctx, sk = ctx_sk
    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    ct = bfv.encrypt(bfv.encode(ctx, vals), sk, err_rng=det_rng(b"e"))
    # seeded path
    ct_zero = bfv.encrypt_zero(ctx, sk, seed=bytes(range(32)), err_rng=det_rng(b"z"))
    msg = pc.ciphertext_to_proto(ct_zero)
    assert msg.WhichOneof("serialized_ciphertext_type") == "seeded"
    back = pc.ciphertext_from_proto(
        pb.he_pb2.SerializedCiphertext.FromString(msg.SerializeToString()), ctx
    )
    assert bfv.decode(ctx, bfv.decrypt(back, sk)) == [0] * ctx.degree
    # full path
    ct.seed = None
    msg = pc.ciphertext_to_proto(ct)
    assert msg.WhichOneof("serialized_ciphertext_type") == "full"
    back = pc.ciphertext_from_proto(
        pb.he_pb2.SerializedCiphertext.FromString(msg.SerializeToString()), ctx
    )
    assert bfv.decode(ctx, bfv.decrypt(back, sk)) == vals


def test_evaluation_key_proto_roundtrip(ctx_sk):
    ctx, sk = ctx_sk
    ek = keys.generate_evaluation_key(
        ctx,
        keys.EvaluationKeyConfig(galois_elements=(3,), has_relinearization_key=True),
        sk,
        det_rng(b"k"),
    )
    msg = pc.evaluation_key_to_proto(ek)
    data = msg.SerializeToString()
    ek2 = pc.evaluation_key_from_proto(
        pb.he_pb2.SerializedEvaluationKey.FromString(data), ctx
    )
    assert set(ek2.galois_key.keys) == {3}
    assert ek2.relinearization_key is not None


def test_pir_parameters_proto_roundtrip(ctx_sk):
    ctx, _ = ctx_sk
    from she_tpu.pir import index_pir as ip, keyword_pir as kp

    config = ip.IndexPirConfig(entry_count=10, entry_size_in_bytes=3, dimension_count=2, batch_size=2,
                               uneven_dimensions=True, key_compression=ip.PirKeyCompression.NO_COMPRESSION)
    parameter = ip.generate_parameter(config, ctx)
    kw_param = kp.KeywordPirParameter(2, kp.ShardingFunction("doubleMod", 8))
    msg = pc.pir_parameters_to_proto(parameter, ctx.params, kw_param)
    ep2, p2, kw2 = pc.pir_parameters_from_proto(
        pb.pir_pb2.PirParameters.FromString(msg.SerializeToString()), scalar_bits=32
    )
    assert p2.dimensions == parameter.dimensions
    assert p2.entry_count == parameter.entry_count
    assert p2.evaluation_key_config == parameter.evaluation_key_config
    assert kw2.hash_function_count == 2
    assert kw2.sharding_function.kind == "doubleMod"
    assert ep2 == paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)


def test_keyword_database_proto_roundtrip():
    rows = {b"a": b"1", b"bb": b"22"}
    msg = pc.keyword_database_to_proto(rows)
    back = pc.keyword_database_from_proto(
        pb.pir_pb2.KeywordDatabase.FromString(msg.SerializeToString())
    )
    assert back == rows


def test_pir_query_response_proto_roundtrip(ctx_sk):
    ctx, sk = ctx_sk
    from she_tpu.pir import index_pir as ip

    config = ip.IndexPirConfig(entry_count=6, entry_size_in_bytes=2, dimension_count=2, batch_size=1,
                               uneven_dimensions=True, key_compression=ip.PirKeyCompression.NO_COMPRESSION)
    parameter = ip.generate_parameter(config, ctx)
    client = ip.MulPirClient(parameter, ctx)
    query = client.generate_query([3], sk)
    msg = pc.pir_query_to_proto(query)
    q2 = pc.pir_query_from_proto(
        pb.pir_pb2.EncryptedIndices.FromString(msg.SerializeToString()), ctx
    )
    assert q2.indices_count == 1
    assert len(q2.ciphertexts) == len(query.ciphertexts)
    database = [bytes([i, i]) for i in range(6)]
    server = ip.MulPirServer(parameter, ctx, [ip.MulPirServer.process(database, ctx, parameter)])
    ek = client.generate_evaluation_key(sk, det_rng(b"k"))
    response = server.compute_response(q2, ek)
    vecs = pc.pir_response_to_proto(response)
    data = [v.SerializeToString() for v in vecs]
    r2 = pc.pir_response_from_proto(
        [pb.he_pb2.SerializedCiphertextVec.FromString(d) for d in data], ctx
    )
    assert client.decrypt(r2, [3], sk)[0][:2] == database[3]


def test_pnns_matrix_proto_roundtrip(ctx_sk):
    ctx, sk = ctx_sk
    from she_tpu.pnns import pnns

    rng = np.random.default_rng(2)
    dims = pnns.MatrixDimensions(2, 3)
    vals = [int(v) for v in rng.integers(0, ctx.plaintext_modulus, size=dims.count)]
    m = pnns.PlaintextMatrix.from_values(ctx, dims, pnns.MatrixPacking.dense_row(), vals)
    msg = pc.plaintext_matrix_to_proto(m)
    m2 = pc.plaintext_matrix_from_proto(
        pb.pnns_pb2.SerializedPlaintextMatrix.FromString(msg.SerializeToString()),
        ctx,
        fmt="coeff",
    )
    assert m2.unpack() == vals
    enc = m.encrypt(sk, err_rng=det_rng(b"e"))
    cmsg = pc.ciphertext_matrix_to_proto(enc)
    c2 = pc.ciphertext_matrix_from_proto(
        pb.pnns_pb2.SerializedCiphertextMatrix.FromString(cmsg.SerializeToString()), ctx
    )
    assert c2.decrypt(sk).unpack() == vals


def test_pnns_database_proto_roundtrip():
    from she_tpu.pnns import pnns

    db = pnns.Database(
        [
            pnns.DatabaseRow(1, b"meta", np.array([1.0, 2.0], dtype=np.float32)),
            pnns.DatabaseRow(2, b"", np.array([0.5, -1.5], dtype=np.float32)),
        ]
    )
    msg = pc.pnns_database_to_proto(db)
    db2 = pc.pnns_database_from_proto(pb.pnns_pb2.Database.FromString(msg.SerializeToString()))
    assert db2.rows[0].entry_id == 1
    assert db2.rows[0].entry_metadata == b"meta"
    assert np.allclose(db2.rows[1].vector, [0.5, -1.5])

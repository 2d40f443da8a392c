"""Standalone CI check: the staged w64 batched server is bit-identical
to the reference-path server (the pytest variant of this assertion is
gated by SHE_TPU_SLOW_TESTS). Cost warning: the staged respond compiles
in ~70 s from the disk cache, but the eager reference pass pays XLA:CPU
per-op compiles — 20-40+ min on a cold 2-core host (same against the
round-4 commit; an XLA:CPU property, not a code regression).

Usage: python benchmarks/staged_w64_cpu_check.py
"""
import os, sys, faulthandler
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["SHE_TPU_STAGED_SERVING"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
faulthandler.dump_traceback_later(360, repeat=True)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr
import time
det = lambda t: nist_aes128_ctr((t * 32)[:32])
ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 64)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(entry_count=12, entry_size_in_bytes=1,
    dimension_count=2, batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
rng = np.random.default_rng(5)
database = [bytes(rng.integers(0, 256, size=1).tolist()) for _ in range(12)]
processed = ip.MulPirServer.process(database, ctx, parameter)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
reference_server = ip.MulPirServer(parameter, ctx, [processed])
batched_server = serving.BatchedMulPirServer(parameter, ctx, [processed])
indices = [0, 11]
queries = [client.generate_query([i], sk) for i in indices]
t0 = time.perf_counter()
batch_responses = batched_server.compute_response_batch(queries, ek)
print(f"batched (staged): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for i, (index, query) in enumerate(zip(indices, queries)):
    ref_response = reference_server.compute_response(query, ek)
    got = client.decrypt(batch_responses[i], [index], sk)
    assert got[0][:1] == database[index]
    for ref_reply, got_reply in zip(ref_response.ciphertexts, batch_responses[i].ciphertexts):
        for rc, gc in zip(ref_reply, got_reply):
            for rp, gp in zip(rc.polys, gc.polys):
                assert (np.asarray(rp.data) == np.asarray(gp.data)).all()
print(f"reference+compare: {time.perf_counter()-t0:.1f}s", flush=True)
print("PASS", flush=True)

import os, sys, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import numpy as np
from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr
det = lambda t: nist_aes128_ctr((t * 32)[:32])
ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=64)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(entry_count=1_000_000, entry_size_in_bytes=1,
    dimension_count=2, batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
rng = np.random.default_rng(0)
values = rng.integers(0, 256, size=1_000_000, dtype=np.uint8)
database = [bytes([v]) for v in values]
processed = ip.MulPirServer.process(database, ctx, parameter)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
server = serving.BatchedMulPirServer(parameter, ctx, [processed])
B = 128
queries = [client.generate_query([int(rng.integers(0, 1_000_000))], sk) for _ in range(B)]
t0 = time.perf_counter()
responses = server.compute_response_batch(queries, ek)
np.asarray(responses[0].ciphertexts[0][0].polys[0].data[..., :2])
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
e2e = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    responses = server.compute_response_stream([queries] * 3, ek)
    np.asarray(responses[-1].ciphertexts[0][0].polys[0].data[..., :2])
    e2e = max(e2e, B * 3 / (time.perf_counter() - t0))
print(f"w64 end-to-end (pipelined): {e2e:.1f} q/s", flush=True)

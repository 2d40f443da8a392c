"""PIR serving throughput with a real execution fence.

jax.block_until_ready on the axon tunnel acks enqueue without waiting for
execution (measured: a 50-deep dependent chain of 100 MB adds "completes"
in 1.4 ms, then fetching the result waits 88 s). Every window here ends
with a tiny host fetch of the last response, which forces the whole
dependency chain to execute before the clock stops.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(
    entry_count=entries, entry_size_in_bytes=1, dimension_count=2,
    batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
rng = np.random.default_rng(0)
values = rng.integers(0, 256, size=entries, dtype=np.uint8)
database = [bytes([v]) for v in values]
t0 = time.perf_counter()
processed = ip.MulPirServer.process(database, ctx, parameter)
print(f"DB processed in {time.perf_counter()-t0:.1f}s "
      f"(dim0_mxu={os.environ.get('SHE_TPU_DIM0_MXU','1')})", flush=True)
server = serving.BatchedMulPirServer(parameter, ctx, [processed])
indices = [int(rng.integers(0, entries)) for _ in range(B)]
queries = [client.generate_query([i], sk) for i in indices]

def fence(responses):
    return np.asarray(responses[-1].ciphertexts[0][0].polys[0].data[:, :, :2])

t0 = time.perf_counter()
responses = server.compute_response_batch(queries, ek)
fence(responses)
print(f"compile+first batch (fenced): {time.perf_counter()-t0:.1f}s", flush=True)
got = client.decrypt(responses[0], [indices[0]], sk)
assert got[0][:1] == database[indices[0]], "PIR answer mismatch"

for window in range(3):
    t0 = time.perf_counter()
    for _ in range(n_iters):
        responses = server.compute_response_batch(queries, ek)
    fence(responses)
    dt = time.perf_counter() - t0
    print(f"window {window}: {B*n_iters/dt:.2f} q/s (fenced, {n_iters} batches)", flush=True)

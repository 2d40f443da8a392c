"""Sweep PIR serving batch size with one DB processing pass."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pir import index_pir as ip
from she_tpu.pir.serving import BatchedMulPirServer
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
entry_count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(
    entry_count=entry_count, entry_size_in_bytes=1, dimension_count=2,
    batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))

rng = np.random.default_rng(0)
entries = [rng.integers(0, 256, size=1, dtype=np.uint8).tobytes() for _ in range(entry_count)]
t0 = time.perf_counter()
db = ip.MulPirServer.process(entries, ctx, parameter)
print(f"DB processed in {time.perf_counter()-t0:.1f}s", flush=True)
server = BatchedMulPirServer(parameter, ctx, [db])

for batch in (32, 96, 128, 192, 256):
    queries = [client.generate_query([i % entry_count], sk) for i in range(batch)]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    jax.block_until_ready(responses[-1].ciphertexts[0][0].polys[0].data)
    print(f"batch={batch}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        responses = server.compute_response_batch(queries, ek)
    jax.block_until_ready(responses[-1].ciphertexts[0][0].polys[0].data)
    qps = batch * n_iters / (time.perf_counter() - t0)
    print(f"batch={batch}: {qps:.2f} q/s", flush=True)

"""Stage-level timing of the STAGED PIR serving pipeline (small cached jits
— fast to compile over the axon tunnel, unlike the fused program) plus a
steady-state throughput comparison vs the fused path.

Usage: python benchmarks/pir_staged_profile.py [entries] [batch]
"""
import os
import sys
import time

os.environ.setdefault("SHE_TPU_STAGED_SERVING", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32

ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(
    entry_count=entries, entry_size_in_bytes=1, dimension_count=2,
    batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
print("dims:", parameter.dimensions, "expanded:", parameter.expanded_query_count,
      "chunks:", ip.chunk_count(parameter, ctx), flush=True)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
rng = np.random.default_rng(0)
values = rng.integers(0, 256, size=entries, dtype=np.uint8)
database = [bytes([v]) for v in values]
t0 = time.perf_counter()
processed = ip.MulPirServer.process(database, ctx, parameter)
print(f"DB processed in {time.perf_counter()-t0:.1f}s", flush=True)
server = serving.BatchedMulPirServer(parameter, ctx, [processed])

indices = [int(rng.integers(0, entries)) for _ in range(B)]
queries = [client.generate_query([i], sk) for i in indices]

def fence(x):
    """Tiny host fetch: the axon tunnel acks enqueue on block_until_ready,
    so only a fetch proves execution finished (see bench.py:fence)."""
    return np.asarray(x[..., :2])


t0 = time.perf_counter()
responses = server.compute_response_batch(queries, ek)
fence(responses[0].ciphertexts[0][0].polys[0].data)
print(f"staged compile+first batch: {time.perf_counter()-t0:.1f}s", flush=True)
got = client.decrypt(responses[0], [indices[0]], sk)
assert got[0][:1] == database[indices[0]], "PIR answer mismatch"

for window in range(3):
    t0 = time.perf_counter()
    for _ in range(5):
        responses = server.compute_response_batch(queries, ek)
    fence(responses[-1].ciphertexts[0][0].polys[0].data)
    dt = time.perf_counter() - t0
    print(f"staged window {window}: {B*5/dt:.2f} q/s", flush=True)

# -- per-stage timings using the responder's cached jits --------------------
st = server._staged
stacked, n_ct, indices_count = server.stack_queries(queries)
cts = [
    bfv.Ciphertext(
        ctx,
        [serving.PolyRq(stacked[i][:, p], ctx.ciphertext_context, serving.COEFF)
         for p in range(stacked[i].shape[1])],
    )
    for i in range(n_ct)
]


def _leaf(y):
    """First array leaf of a stage result, for fencing."""
    leaves = jax.tree_util.tree_leaves(y)
    return leaves[0]


def timeit(label, fn, n=5):
    y = fn()
    fence(_leaf(y))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn()
    fence(_leaf(y))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.1f} ms/batch ({dt/B*1e6:.0f} us/query)", flush=True)
    return y


expanded = timeit(
    "expand (all levels)",
    lambda: st._expand_staged(cts[0], parameter.expanded_query_count, ek),
)
d0 = parameter.dimensions[0]
dim0_fn = st._stage(("dim0", d0), st._make_dim0_fn())
chunk0 = (
    server.chunk_digits[0][0] if server.use_dim0_mxu else server.chunks[0][0]
)
cols = timeit("dim0 MAC + iNTT", lambda: dim0_fn(expanded[:d0], chunk0))
group_fn = st._stage(("dims", parameter.dimensions[1]), st._make_group_fn())
v0 = expanded[d0 : d0 + parameter.dimensions[1]]
prod = timeit("dims1 ct-ct BEHZ + relin", lambda: group_fn(v0, cols, ek))
fin = st._stage(("finalize",), st._make_finalize_fn())
timeit("finalize (modswitch+coeff)", lambda: fin(prod))

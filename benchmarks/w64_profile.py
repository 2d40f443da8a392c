"""Per-stage timing of the w64 STAGED MulPIR pipeline at the bench config
(N=8192, 3x55-bit moduli, logt_24, 1M-entry DB, batch 16).

Identifies where the w64 serving gap lives (VERDICT r4 weak #3): expansion
key-switches vs dim-0 MAC vs BEHZ ct-ct vs finalize, plus per-level
expansion costs.

Usage: python benchmarks/w64_profile.py [entries] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=64)
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
    return np.asarray(x[..., :2])


def _leaf(y):
    return jax.tree_util.tree_leaves(y)[0]


t0 = time.perf_counter()
responses = server.compute_response_batch(queries, ek)
fence(responses[0].ciphertexts[0][0].polys[0].data)
print(f"staged compile+first batch: {time.perf_counter()-t0:.1f}s", flush=True)
got = client.decrypt(responses[0], [indices[0]], sk)
assert got[0][:1] == database[indices[0]], "PIR answer mismatch"

stacked, n_ct, indices_count = server.stack_queries(queries)
st = server._staged
assert st is not None, "expected the staged responder (w64 default on TPU)"


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


E = parameter.expanded_query_count
expanded = timeit("expand (all levels)", lambda: st._expand_staged(stacked[0], E, ek))
d0 = parameter.dimensions[0]
dim0_fn = st._stage(("dim0", d0), st._make_dim0_fn())
chunk0 = (
    server.chunk_digits[0][0] if server.use_dim0_mxu else server.chunks[0][0]
)
cols = timeit("dim0 MAC + iNTT", lambda: dim0_fn(expanded[:d0], chunk0))
dim1 = parameter.dimensions[1]
group_fn = st._stage(("dims", dim1), st._make_group_fn(dim1))
v0 = expanded[d0 : d0 + dim1]
prod = timeit("dims1 ct-ct BEHZ + relin", lambda: group_fn(v0, cols[:dim1], ek))
fin = st._stage(("finalize",), st._make_finalize_fn())
timeit("finalize (modswitch+coeff)", lambda: fin(prod))

# (per-level timing removed: level jits now donate the pre-allocated
# expansion pool, so a level step cannot be re-invoked on the same buffer
# outside the managed _expand_staged flow)

# -- steady state for reference ---------------------------------------------
for window in range(4):
    t0 = time.perf_counter()
    for _ in range(3):
        out = server._respond_arrays(stacked, ek, B, n_ct, indices_count)
    fence(out[0][0])
    dt = time.perf_counter() - t0
    print(f"steady window {window}: {B*3/dt:.2f} q/s", flush=True)

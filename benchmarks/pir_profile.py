"""Stage-level timing of the batched PIR serving pipeline, real shapes."""
import time, numpy as np
import jax, jax.numpy as jnp
from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(
    entry_count=1_000_000, entry_size_in_bytes=1, dimension_count=2,
    batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
print("dims:", parameter.dimensions, "expanded:", parameter.expanded_query_count,
      "chunks:", ip.chunk_count(parameter, ctx))
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
B = 32
d0, d1 = parameter.dimensions
ct_ctx = ctx.ciphertext_context
L = len(ct_ctx.moduli); N = ct_ctx.degree
q = client.generate_query([3], sk)
stacked = jnp.stack([jnp.stack([p.data for p in q.ciphertexts[0].polys])] * B)  # [B,2,1,L,N]

def mk_ct(per_query):
    from she_tpu.core.poly import PolyRq, COEFF
    return bfv.Ciphertext(ctx, [serving.PolyRq(per_query[p], ct_ctx, serving.COEFF) for p in range(2)])

# stage 1: expansion
def run_expand(data):
    def one(pq):
        ct = mk_ct(pq)
        ex = serving.expand_batched([ct], parameter.expanded_query_count, ek, ctx)
        return jnp.stack([jnp.stack([p.data for p in c.polys]) for c in ex])
    return jax.vmap(one)(data)
f1 = jax.jit(run_expand)
y = f1(stacked); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(5): y = f1(stacked)
jax.block_until_ready(y); dt = (time.perf_counter()-t0)/5
print(f"expand: {dt*1e3:.1f} ms/batch ({dt/B*1e6:.0f} us/query)")

# expanded queries [B, E, 2, 1, L, N]
E = parameter.expanded_query_count
expanded = np.asarray(y)  # reuse

# stage 2: dim0 MACs
n_chunks = ip.chunk_count(parameter, ctx)
count = d0 * d1
rng = np.random.default_rng(0)
chunk = jnp.asarray(rng.integers(0, (1<<27), size=(d1, d0, 1, L, N), dtype=np.uint32))
def run_dim0(data):
    def one(pq):
        qe = pq[:d0, :, 0]  # [d0, 2, L, N] -- already "eval" for timing
        qe = jnp.stack([qe[:, 0], qe[:, 1]], axis=1)
        return serving.dim0_inner_products(chunk, jnp.stack([pq[:d0, 0], pq[:d0, 1]], axis=1)[:, :, None][:, :, 0][:, :, None] if False else pq[:d0][:, :, 0][:, :, None][:, :, :, 0][:, :, None] if False else pq[:d0], ct_ctx)
    return jax.vmap(one)(data)
# simpler: feed [d0, 2, 1, L, N] per query directly (shape matches query_eval)
def run_dim0(data):
    return jax.vmap(lambda pq: serving.dim0_inner_products(chunk, pq[:d0], ct_ctx))(data)
f2 = jax.jit(run_dim0)
y2 = f2(y); jax.block_until_ready(y2)
t0 = time.perf_counter()
for _ in range(5): y2 = f2(y)
jax.block_until_ready(y2); dt = (time.perf_counter()-t0)/5
print(f"dim0 ({n_chunks} chunk(s) of [{d1},{d0}]): {dt*1e3*n_chunks:.1f} ms/batch ({dt/B*1e6*n_chunks:.0f} us/query)")

# stage 3: higher dims: iNTT columns + ct-ct inner product (d1 pairs) + relin
def run_dims(data, cols):
    from she_tpu.core import poly as polymod
    from she_tpu.core.poly import PolyRq
    def one(pq, res):
        columns = [
            bfv.Ciphertext(ctx, [polymod.inverse_ntt(PolyRq(res[c, p], ct_ctx, serving.EVAL)) for p in range(2)])
            for c in range(d1)]
        rest = [mk_ct(pq[d0 + i]) for i in range(d1)]
        prod = bfv.inner_product_ct_ct(rest, columns)
        out = bfv.relinearize(prod, ek)
        single = bfv.mod_switch_down_to_single(out)
        return jnp.stack([p.data for p in bfv.ct_to_coeff(single).polys])
    return jax.vmap(one)(data, cols)
f3 = jax.jit(run_dims)
y3 = f3(y, y2); jax.block_until_ready(y3)
t0 = time.perf_counter()
for _ in range(5): y3 = f3(y, y2)
jax.block_until_ready(y3); dt = (time.perf_counter()-t0)/5
print(f"dims1+ (iNTT {d1} cols, {d1} ct-ct BEHZ, relin, modswitch): {dt*1e3*n_chunks:.1f} ms/batch ({dt/B*1e6*n_chunks:.0f} us/query)")

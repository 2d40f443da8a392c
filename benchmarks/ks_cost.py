import numpy as np, jax, jax.numpy as jnp
from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(entry_count=1_000_000, entry_size_in_bytes=1,
    dimension_count=2, batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))
B = 32
t_ctx = ctx.ciphertext_context
q = client.generate_query([3], sk)
stacked = jnp.stack([jnp.stack([p.data for p in q.ciphertexts[0].polys])] * B)

def run_expand(data):
    def one(pq):
        ct = bfv.Ciphertext(ctx, [serving.PolyRq(pq[p], t_ctx, serving.COEFF) for p in range(2)])
        ex = serving.expand_batched([ct], parameter.expanded_query_count, ek, ctx)
        return jnp.stack([jnp.stack([p.data for p in c.polys]) for c in ex])
    return jax.vmap(one)(data)

import sys
which = sys.argv[1]
if which == "old":
    keys.compute_key_switching_update = lambda c, t, k: keys._compute_key_switching_update(c, t, k)
c = jax.jit(run_expand).lower(stacked).compile()
ca = c.cost_analysis()
print(which, "flops:", f"{ca.get('flops', 0):.3e}", "bytes:", f"{ca.get('bytes accessed', 0):.3e}",
      "transcendentals:", ca.get("transcendentals", 0))

import time, numpy as np, jax, jax.numpy as jnp
from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.core.poly import PolyRq, COEFF
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
rk = keys.generate_relinearization_key(ctx, sk, err_rng=det(b"r"))
t_ctx = ctx.ciphertext_context
L, N = len(t_ctx.moduli), t_ctx.degree
M = 1024
rng = np.random.default_rng(0)
data = np.zeros((M, 1, L, N), dtype=np.uint32)
for i, q in enumerate(t_ctx.moduli):
    data[:, 0, i] = rng.integers(0, q, size=(M, N), dtype=np.uint32)
x = jnp.asarray(data)

for name, fn in [("old", keys._compute_key_switching_update),
                 ("new", keys._compute_key_switching_update_w32)]:
    from she_tpu.ops import galois as galoismod
    from she_tpu.ops import word as wordmod
    qw = wordmod.as_word(jnp.asarray(t_ctx.q_arr))
    def run(xs):
        def one(d):
            perm = galoismod.apply_galois_coeff((d[0],), qw, 5, t_ctx.word)
            ups = fn(ctx, PolyRq(jnp.stack(perm), t_ctx, COEFF), rk.key_switch_key)
            return jnp.stack([u.data for u in ups])
        return jax.vmap(one)(xs)
    f = jax.jit(run)
    y = f(x); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(5): y = f(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name}: {dt*1e3:.1f} ms for {M} key-switches ({dt/M*1e6:.1f} us each)")

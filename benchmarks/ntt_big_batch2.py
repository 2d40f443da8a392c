"""Careful big-batch NTT re-measure: rotate across 4 distinct input
buffers, per-call block, report implied HBM GB/s as a sanity bound."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, ntt_mxu, ntt_pallas, word as wordmod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
moduli = (134176769, 268369921, 268361729)
degree, nlimbs = 4096, 1
tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
mx = ntt_mxu.build_mxu_tables(moduli, degree, nlimbs)
rng = np.random.default_rng(0)
bufs = []
for k in range(4):
    rows = np.zeros((B, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(B, degree)).astype(object)
    bufs.append(jnp.asarray(wordmod.pack(rows, nlimbs)))
jax.block_until_ready(bufs)
bytes_per_call = B * len(moduli) * degree * 4

def bench(label, f, n=12):
    y = f(bufs[0]); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for i in range(n):
        y = f(bufs[i % 4])
    jax.block_until_ready(y)
    dt = (time.perf_counter()-t0)/n
    gbs = 2 * bytes_per_call / dt / 1e9
    print(f"{label}: {dt*1e3:.2f} ms | {B/dt:,.0f} [3,4096]-transforms/s | "
          f"in+out {gbs:.0f} GB/s", flush=True)

@jax.jit
def staged(x):
    return jnp.stack(nttmod.forward_ntt_arrays(
        wordmod.as_word(x), degree, tabs.word,
        wordmod.as_word(jnp.asarray(tabs.q)), wordmod.as_word(jnp.asarray(tabs.q2)),
        wordmod.as_word(jnp.asarray(tabs.roots)), wordmod.as_word(jnp.asarray(tabs.roots_shoup))))

@jax.jit
def mxu(x):
    return jnp.stack(ntt_mxu.forward_ntt(wordmod.as_word(x), mx))

bench("staged", staged)
bench("mxu   ", mxu)
a = np.asarray(staged(bufs[0])); b = np.asarray(mxu(bufs[0]))
assert (a == b).all()
os.environ["SHE_TPU_NTT_PALLAS"] = "1"
if ntt_pallas.use_pallas(tabs):
    @jax.jit
    def pal(x):
        return jnp.stack(ntt_pallas.forward_ntt(wordmod.as_word(x), tabs))
    bench("pallas", pal)
    c = np.asarray(pal(bufs[0])); assert (a == c).all()

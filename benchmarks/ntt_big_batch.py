"""NTT kernel shootout at SERVING shapes (large batch, spills to HBM):
staged XLA vs Pallas (VMEM-resident) vs MXU-matmul. The staged path is
~12 HBM passes at these shapes (ks_parts.py measurement)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, ntt_mxu, ntt_pallas, word as wordmod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
moduli = (134176769, 268369921, 268361729)  # the n_4096 key-switch context
degree, nlimbs = 4096, 1
tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
mx = ntt_mxu.build_mxu_tables(moduli, degree, nlimbs)
rng = np.random.default_rng(0)
rows = np.zeros((B, len(moduli), degree), dtype=object)
for i, q in enumerate(moduli):
    rows[:, i, :] = rng.integers(0, q, size=(B, degree)).astype(object)
data = jnp.asarray(wordmod.pack(rows, nlimbs))

def bench(label, f, n=5):
    t0 = time.perf_counter(); y = f(data); jax.block_until_ready(y)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n): y = f(data)
    jax.block_until_ready(y)
    dt = (time.perf_counter()-t0)/n
    rate = B / dt
    print(f"{label}: {dt*1e3:.2f} ms ({rate:,.0f} poly-transforms/s of "
          f"[{len(moduli)},{degree}]; compile {comp:.0f}s)", flush=True)
    return y

@jax.jit
def staged(x):
    return jnp.stack(nttmod.forward_ntt_arrays(
        wordmod.as_word(x), degree, tabs.word,
        wordmod.as_word(jnp.asarray(tabs.q)), wordmod.as_word(jnp.asarray(tabs.q2)),
        wordmod.as_word(jnp.asarray(tabs.roots)), wordmod.as_word(jnp.asarray(tabs.roots_shoup))))

@jax.jit
def mxu(x):
    return jnp.stack(ntt_mxu.forward_ntt(wordmod.as_word(x), mx))

y0 = bench("staged", staged)
y1 = bench("mxu   ", mxu)
assert (np.asarray(y0) == np.asarray(y1)).all()
os.environ["SHE_TPU_NTT_PALLAS"] = "1"
if ntt_pallas.use_pallas(tabs):
    @jax.jit
    def pal(x):
        return jnp.stack(ntt_pallas.forward_ntt(wordmod.as_word(x), tabs))
    y2 = bench("pallas", pal)
    assert (np.asarray(y0) == np.asarray(y2)).all()
else:
    print("pallas: not available for this config", flush=True)

"""Sweep the Pallas NTT inner sub-block budget for w64 N=8192."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, ntt_pallas, word as wordmod

moduli = ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327)
degree, nlimbs, batch, iters = 8192, 2, 64, 10
tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
rng = np.random.default_rng(0)
rows = np.zeros((batch, len(moduli), degree), dtype=object)
for i, q in enumerate(moduli):
    rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
data = jnp.asarray(wordmod.pack(rows, nlimbs))

def fence(x): return np.asarray(x[..., :2])

for kb in (64, 128, 256, 512, 1024):
    os.environ["SHE_TPU_PALLAS_SUB_KB"] = str(kb)

    @jax.jit
    def many(x):
        def body(c, _):
            w = tuple(c[i] for i in range(nlimbs))
            y = ntt_pallas.forward_ntt(w, tables)
            z = ntt_pallas.inverse_ntt(y, tables)
            return jnp.stack(z), ()
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    try:
        out = many(data); fence(out)
        assert (np.asarray(out) == np.asarray(data)).all(), "roundtrip"
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            fence(many(data))
            best = max(best, 2 * batch * iters / (time.perf_counter() - t0))
        print(f"sub_kb={kb}: {best:.0f} transforms/s", flush=True)
    except Exception as e:
        print(f"sub_kb={kb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

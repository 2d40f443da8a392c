import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, word as wordmod

def bench(moduli, degree, nlimbs, batch, inner=10, n_it=5):
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    data = wordmod.pack(rows, nlimbs)
    x = jnp.asarray(data)
    res = {}
    for mode in ("0", "1"):
        os.environ["SHE_TPU_NTT_PALLAS"] = mode
        def step_f(c, _):
            w = tuple(c[i] for i in range(nlimbs))
            return jnp.stack(nttmod.inverse_ntt(nttmod.forward_ntt(w, tables), tables)), None
        loop = jax.jit(lambda x: jax.lax.scan(step_f, x, None, length=inner)[0])
        y = loop(x); y.block_until_ready()
        assert (wordmod.unpack(np.asarray(y)) == rows).all(), f"roundtrip fail mode={mode}"
        t0 = time.perf_counter()
        for _ in range(n_it):
            y = loop(y)
        y.block_until_ready()
        dt = time.perf_counter() - t0
        # each inner step = 1 fwd + 1 inv = 2 transforms
        res["staged" if mode == "0" else "pallas"] = 2 * batch * inner * n_it / dt
    return res

w32 = bench(((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727), 4096, 1, 128)
print(f"w32 N=4096 L=3: staged {w32['staged']:.0f} tf/s, pallas {w32['pallas']:.0f} tf/s")
w64 = bench(((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327), 8192, 2, 64)
print(f"w64 N=8192 L=3: staged {w64['staged']:.0f} tf/s, pallas {w64['pallas']:.0f} tf/s")

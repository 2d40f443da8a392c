"""Back-to-back A/B of radix-2 vs radix-4 staged NTT on the real chip
(same process, fenced scan chains), w64 N=8192x3 and w32 N=4096x3."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, word as wordmod


def fence(x):
    return np.asarray(x[..., :2])


def bench(moduli, degree, nlimbs, batch=64, iters=10):
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    data = jnp.asarray(wordmod.pack(rows, nlimbs))

    results = {}
    for mode in ("radix2", "radix4"):
        os.environ["SHE_TPU_NTT_RADIX4"] = "1" if mode == "radix4" else "0"

        @jax.jit
        def fwd_many(x):
            def body(c, _):
                w = tuple(c[i] for i in range(nlimbs))
                y = nttmod.forward_ntt(w, tables)
                z = nttmod.inverse_ntt(y, tables)
                return jnp.stack(z), ()

            y, _ = jax.lax.scan(body, x, None, length=iters)
            return y

        out = fwd_many(data)
        fence(out)
        # round-trip sanity: fwd+inv is identity
        assert (np.asarray(out) == np.asarray(data)).all(), f"{mode} roundtrip"
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            fence(fwd_many(data))
            best = max(best, 2 * batch * iters / (time.perf_counter() - t0))
        results[mode] = best
        print(f"  {mode}: {best:.0f} transforms/s (fwd+inv counted separately)",
              flush=True)
    print(f"  radix4/radix2 = {results['radix4']/results['radix2']:.2f}x", flush=True)


print("w64 N=8192 x 3x55-bit:", flush=True)
bench(((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327), 8192, 2)
print("w32 N=4096 x 27/28/28-bit:", flush=True)
bench(((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727), 4096, 1)

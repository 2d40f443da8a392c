"""Staged (VPU) vs MXU-matmul NTT throughput on the real TPU.

Usage: python benchmarks/ntt_mxu_bench.py [batch]
Prints transforms/sec (one transform = all L RNS rows of one polynomial)
and the implied HBM/MXU utilization for the roofline table in
docs/ARCHITECTURE.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from she_tpu.ops import ntt as nttmod, ntt_mxu, word as wordmod

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

CONFIGS = [
    ("w32 N=4096x3", ((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727), 4096, 1),
    ("w64 N=8192x3", ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327), 8192, 2),
]


def bench(fn, x, n_iters=10, windows=3):
    y = fn(x)
    jax.block_until_ready(y)
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            y = fn(x)
        jax.block_until_ready(y)
        best = max(best, batch * n_iters / (time.perf_counter() - t0))
    return best


for label, moduli, degree, nlimbs in CONFIGS:
    tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    mx = ntt_mxu.build_mxu_tables(moduli, degree, nlimbs)
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    data = jnp.asarray(wordmod.pack(rows, nlimbs))

    @jax.jit
    def staged_fwd(x):
        return jnp.stack(nttmod.forward_ntt_arrays(
            wordmod.as_word(x), degree, tabs.word,
            wordmod.as_word(jnp.asarray(tabs.q)),
            wordmod.as_word(jnp.asarray(tabs.q2)),
            wordmod.as_word(jnp.asarray(tabs.roots)),
            wordmod.as_word(jnp.asarray(tabs.roots_shoup))))

    @jax.jit
    def mxu_fwd(x):
        return jnp.stack(ntt_mxu.forward_ntt(wordmod.as_word(x), mx))

    @jax.jit
    def mxu_inv(x):
        return jnp.stack(ntt_mxu.inverse_ntt(wordmod.as_word(x), mx))

    r_staged = bench(staged_fwd, data)
    r_mxu = bench(mxu_fwd, data)
    r_mxu_i = bench(mxu_inv, data)
    # sanity: bit-equality on device
    assert (np.asarray(staged_fwd(data)) == np.asarray(mxu_fwd(data))).all()
    bytes_per = nlimbs * len(moduli) * degree * 4
    print(f"{label}: staged {r_staged:,.0f} t/s | mxu fwd {r_mxu:,.0f} t/s "
          f"| mxu inv {r_mxu_i:,.0f} t/s "
          f"| mxu fwd HBM r+w {2 * bytes_per * r_mxu / 1e9:.0f} GB/s",
          flush=True)

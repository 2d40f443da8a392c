"""Staged (VPU) vs MXU-matmul NTT throughput on the real TPU.

Methodology: the axon tunnel's block_until_ready acks enqueue without
waiting for execution, so each measurement chains `scan_len` dependent
transforms inside ONE jitted scan and ends with a tiny host fetch (the
fence), which cannot return before the chain has executed.

Usage: python benchmarks/ntt_mxu_bench.py [batch] [scan_len]
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
scan_len = int(sys.argv[2]) if len(sys.argv) > 2 else 20

CONFIGS = [
    ("w32 N=4096x3", ((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727), 4096, 1),
    ("w64 N=8192x3", ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327), 8192, 2),
]


def fence(y):
    return np.asarray(y[..., :2])


def bench(fn_scan, x, windows=3):
    fence(fn_scan(x))  # warm/compile
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        fence(fn_scan(x))
        best = max(best, batch * scan_len / (time.perf_counter() - t0))
    return best


for label, moduli, degree, nlimbs in CONFIGS:
    tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    mx = ntt_mxu.build_mxu_tables(moduli, degree, nlimbs)
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    data = jnp.asarray(wordmod.pack(rows, nlimbs))

    def staged_body(c, _):
        w = tuple(c[i] for i in range(nlimbs))
        return jnp.stack(nttmod.forward_ntt_arrays(
            w, degree, tabs.word,
            wordmod.as_word(jnp.asarray(tabs.q)),
            wordmod.as_word(jnp.asarray(tabs.q2)),
            wordmod.as_word(jnp.asarray(tabs.roots)),
            wordmod.as_word(jnp.asarray(tabs.roots_shoup)))), ()

    def mxu_body(c, _):
        w = tuple(c[i] for i in range(nlimbs))
        return jnp.stack(ntt_mxu.forward_ntt(w, mx)), ()

    def mxu_inv_body(c, _):
        w = tuple(c[i] for i in range(nlimbs))
        return jnp.stack(ntt_mxu.inverse_ntt(w, mx)), ()

    mk = lambda body: jax.jit(
        lambda x: jax.lax.scan(body, x, None, length=scan_len)[0]
    )
    staged_f, mxu_f, mxu_i = mk(staged_body), mk(mxu_body), mk(mxu_inv_body)
    # bit-equality on device first
    a = np.asarray(jax.jit(lambda x: staged_body(x, None)[0])(data))
    b = np.asarray(jax.jit(lambda x: mxu_body(x, None)[0])(data))
    assert (a == b).all(), label
    r_staged = bench(staged_f, data)
    r_mxu = bench(mxu_f, data)
    r_mxu_i = bench(mxu_i, data)
    bytes_per = nlimbs * len(moduli) * degree * 4
    print(f"{label} (batch={batch}, fenced scan x{scan_len}): "
          f"staged {r_staged:,.0f} t/s | mxu fwd {r_mxu:,.0f} t/s "
          f"| mxu inv {r_mxu_i:,.0f} t/s "
          f"| mxu fwd minimum HBM r+w {2 * bytes_per * r_mxu / 1e9:.0f} GB/s",
          flush=True)

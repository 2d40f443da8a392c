"""A/B: staged NTT in the current [..., L, N] layout vs a batch-transposed
[L, N, B] layout where the butterfly partner axis lives on SUBLANES and the
batch fills the 128 lanes.

Hypothesis: the late small-t stages of the current layout slice minor dims
of size t < 128, forcing a lane relayout per stage — honest (fenced)
measurements put the staged NTT at ~5-15% of both VPU and HBM rooflines.
With the batch on lanes, every stage's reshape [L, m, 2, t, B] touches only
leading axes and the per-stage work is pure elementwise VPU math.

RESULT (v5e, fenced, batch=128, 2026-08-21): the hypothesis is WRONG —
the transposed layout LOSES: w32 N=4096x3 44.8k vs 35.4k transforms/s,
w64 N=8192x3 28.8k vs 25.4k. The entry/exit moveaxis transposes plus the
sublane-axis butterflies cost more than the lane relayouts they avoid;
XLA:TPU evidently handles the small-t lane stages better than the roofline
gap suggested (the gap is dominated by per-stage HBM materialization,
which this experiment does not remove). Kept as a recorded negative result
alongside ops/ntt_pallas.py and ops/ntt_mxu.py's post-mortems.

Usage: python benchmarks/ntt_transposed_bench.py [w32|w64] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from she_tpu.ops import ntt as nttmod
from she_tpu.ops import word as wordmod
from she_tpu.ops.ntt import (
    _lazy_sub_2q,
    _wmap,
    _wrap_add,
    _wrap_sub,
    _wslice,
)
from she_tpu.utils import nt


def forward_ntt_arrays_T(x, n, W, q, q2, roots, roots_sh):
    """Forward NTT on word of [B, L, N] via the transposed [L, N, B] layout.
    Bit-identical values to forward_ntt_arrays (same stage math)."""
    B = x[0].shape[0]
    L = x[0].shape[1]
    xt = _wmap(lambda a: jnp.moveaxis(a, 0, -1), x)  # [L, N, B]
    log2n = nt.log2_exact(n)
    qb = _wmap(lambda a: a[:, :, None, None], q)  # [L, 1, 1, 1]
    q2b = _wmap(lambda a: a[:, :, None, None], q2)
    for log2m in range(log2n):
        m = 1 << log2m
        t = n >> (log2m + 1)
        w = _wmap(lambda a: a[:, m : 2 * m, None, None], roots)  # [L, m, 1, 1]
        ws = _wmap(lambda a: a[:, m : 2 * m, None, None], roots_sh)
        xv = _wmap(lambda a: a.reshape(L, m, 2, t, B), xt)
        xx = _wslice(xv, (slice(None), slice(None), 0))
        yy = _wslice(xv, (slice(None), slice(None), 1))
        xx = _lazy_sub_2q(W, xx, q2b)
        tt = W.mul_shoup_lazy(yy, w, ws, qb)
        new_x = _wrap_add(W, xx, tt)
        new_y = _wrap_add(W, _wrap_sub(W, xx, tt), q2b)
        xt = tuple(
            jnp.stack([nx, ny], axis=2).reshape(L, n, B)
            for nx, ny in zip(new_x, new_y)
        )
    xt = W.reduce_4q(xt, _wmap(lambda a: a[:, :, None], q))
    return _wmap(lambda a: jnp.moveaxis(a, -1, 0), xt)


def main():
    width = sys.argv[1] if len(sys.argv) > 1 else "w64"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if width == "w32":
        moduli = (134176769, 268369921, 268361729)
        degree = 4096
        nlimbs = 1
    else:
        moduli = ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327)
        degree = 8192
        nlimbs = 2
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    W = tables.word
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, int(q), size=(batch, degree)).astype(object)
    data = jnp.asarray(wordmod.pack(rows, nlimbs))

    qw = wordmod.as_word(jnp.asarray(tables.q))
    q2w = wordmod.as_word(jnp.asarray(tables.q2))
    rw = wordmod.as_word(jnp.asarray(tables.roots))
    rsw = wordmod.as_word(jnp.asarray(tables.roots_shoup))

    n_iters = 10

    def chained(step):
        def run(x):
            def body(c, _):
                w = tuple(c[i] for i in range(nlimbs))
                return jnp.stack(step(w)), ()

            y, _ = jax.lax.scan(body, x, None, length=n_iters)
            return y

        return jax.jit(run)

    cur = chained(
        lambda w: nttmod.forward_ntt_arrays(w, degree, W, qw, q2w, rw, rsw)
    )
    tra = chained(
        lambda w: forward_ntt_arrays_T(w, degree, W, qw, q2w, rw, rsw)
    )

    def fence(y):
        return np.asarray(y[..., :2])

    # correctness: transposed == current (bit-exact)
    a = np.asarray(
        jnp.stack(
            nttmod.forward_ntt_arrays(
                tuple(data[i] for i in range(nlimbs)), degree, W, qw, q2w, rw, rsw
            )
        )
    )
    b = np.asarray(
        jnp.stack(
            forward_ntt_arrays_T(
                tuple(data[i] for i in range(nlimbs)), degree, W, qw, q2w, rw, rsw
            )
        )
    )
    print("bit-equal:", bool((a == b).all()), flush=True)

    for label, f in (("current", cur), ("transposed", tra)):
        fence(f(data))  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            fence(f(data))
            best = max(best, batch * n_iters / (time.perf_counter() - t0))
        print(f"{label}: {best:.0f} transforms/sec (batch={batch}, {width})",
              flush=True)


if __name__ == "__main__":
    main()

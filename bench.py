"""Benchmark: negacyclic NTT throughput on TPU (north-star metric #1).

Config matches BASELINE.md / RlweBenchmark: N=8192, 3 RNS moduli
(the 3x55-bit w64 set from n_8192_logq_3x55_logt_42, i.e. the reference's
Bfv<UInt64> flagship config). One "transform" = one full forward NTT of a
[3, 8192] RNS polynomial (all 3 limbs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no absolute numbers (BASELINE.md);
the Swift CPU estimate used here is ~1000 polys/sec (3x55-bit moduli,
N=8192: ~0.3-0.4 ms per 8192-point 64-bit NTT per modulus on a fast
x86/ARM core with -cross-module-optimization, x3 moduli).
"""

import json
import sys
import time

import numpy as np

SWIFT_CPU_BASELINE_TRANSFORMS_PER_SEC = 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from she_tpu.ops import ntt as nttmod
    from she_tpu.ops import word as wordmod

    moduli = ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327)
    degree = 8192
    nlimbs = 2
    batch = 64

    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    rng = np.random.default_rng(0)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    data = wordmod.pack(rows, nlimbs)

    @jax.jit
    def fwd(x):
        w = tuple(x[i] for i in range(nlimbs))
        out = nttmod.forward_ntt(w, tables)
        return jnp.stack(out)

    x = jnp.asarray(data)
    # compile + warmup
    fwd(x).block_until_ready()
    # sanity: bit-exact vs host reference on one row
    out = np.asarray(fwd(x))
    from she_tpu.utils import refimpl

    got = wordmod.unpack(out[:, 0, :1, :])[0]
    expect = refimpl.forward_ntt([int(v) for v in rows[0, 0]], moduli[0])
    assert list(got) == expect, "TPU NTT mismatch vs host reference"

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        r = fwd(x)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    transforms_per_sec = batch * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "ntt_forward_transforms_per_sec_n8192_3x55bit",
                "value": round(transforms_per_sec, 2),
                "unit": "transforms/sec",
                "vs_baseline": round(
                    transforms_per_sec / SWIFT_CPU_BASELINE_TRANSFORMS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

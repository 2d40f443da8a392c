"""Measured XLA:CPU anchor for the w64 (N=8192, 3x55-bit) MulPIR baseline.

Same derivation as benchmarks/cpu_baseline.py (the reference publishes no
numbers and no Swift toolchain exists here): run the EXACT w64 serving
workload of bench.bench_pir_w64 — 1M x 1B keyword DB, n_8192_logq_3x55_
logt_24, eager-vmap executor (the staged-stage compile is pathological on XLA:CPU at this N) — on XLA:CPU and report q/s per core; a
production 16-core host bound is cores * per-core rate. XLA:CPU compiles
the same u32-limb kernels to AVX-512, which per core is at least as fast
as the reference's scalar UInt64/UInt128 Swift loops on this algorithm, so
the scaled figure over-estimates (upper-bounds) the Swift CPU number.

Usage: JAX_PLATFORMS=cpu python benchmarks/cpu_baseline_w64.py [entries] [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SHE_TPU_STAGED_SERVING", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def main():
    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_cores = os.cpu_count()

    ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=64)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))
    config = ip.IndexPirConfig(
        entry_count=entries, entry_size_in_bytes=1, dimension_count=2,
        batch_size=1, uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION)
    parameter = ip.generate_parameter(config, ctx)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det(b"k"))
    rng = np.random.default_rng(0)
    values = rng.integers(0, 256, size=entries, dtype=np.uint8)
    database = [bytes([v]) for v in values]
    t0 = time.perf_counter()
    processed = ip.MulPirServer.process(database, ctx, parameter)
    print(f"DB processed in {time.perf_counter()-t0:.1f}s "
          f"({processed.count} plaintexts, dims {parameter.dimensions})", flush=True)
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])

    indices = [int(rng.integers(0, entries)) for _ in range(B)]
    queries = [client.generate_query([i], sk) for i in indices]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    jax.block_until_ready(responses[0].ciphertexts[0][0].polys[0].data)
    print(f"compile+first batch: {time.perf_counter()-t0:.1f}s", flush=True)
    got = client.decrypt(responses[0], [indices[0]], sk)
    assert got[0][:1] == database[indices[0]], "w64 PIR answer mismatch"

    best = 0.0
    for window in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            responses = server.compute_response_batch(queries, ek)
        jax.block_until_ready(responses[-1].ciphertexts[0][0].polys[0].data)
        qps = B * 2 / (time.perf_counter() - t0)
        best = max(best, qps)
        print(f"window {window}: {qps:.3f} q/s", flush=True)
    print(
        f"XLA:CPU w64 MulPIR ({entries} entries): {best:.3f} q/s on "
        f"{n_cores} cores -> {best / n_cores:.4f} q/s/core; "
        f"16-core reference-host bound: {16 * best / n_cores:.2f} q/s",
        flush=True,
    )


if __name__ == "__main__":
    main()

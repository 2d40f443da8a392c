"""Measured CPU anchor for the Swift-baseline estimate in bench.py.

The reference publishes no benchmark numbers and this image has no Swift
toolchain (BASELINE.md), so the denominator for "vs_baseline" must be
derived. This script produces the measured half of that derivation: it runs
the EXACT MulPIR serving workload of the headline benchmark (1M x 1B
keyword-PIR database, n_4096_logq_27_28_28_logt_5, query expansion + dim-0
ct-pt inner products + dim-1 BEHZ ct-ct products + relinearize + modswitch)
on XLA:CPU on this host and reports queries/sec per core.

Why this anchors the Swift number: XLA:CPU compiles the same integer
kernels to AVX-512 vector code; per core it is at least as fast as the
reference's scalar-with-autovectorization Swift on the same algorithm
(the reference's hot loops are UInt64/UInt128 scalar Barrett/Shoup chains,
Bfv.swift:236-651). So   swift_baseline <= cpu_qps_per_core * N_cores
for a production host. bench.py documents the resulting bound.

Usage: JAX_PLATFORMS=cpu python benchmarks/cpu_baseline.py [entries] [batch]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SHE_TPU_STAGED_SERVING", "1")

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def main():
    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    entries = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_cores = os.cpu_count()

    ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
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
    print(f"DB processed in {time.perf_counter()-t0:.1f}s", flush=True)
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])

    indices = [int(rng.integers(0, entries)) for _ in range(B)]
    queries = [client.generate_query([i], sk) for i in indices]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    jax.block_until_ready(responses[0].ciphertexts[0][0].polys[0].data)
    print(f"compile+first batch: {time.perf_counter()-t0:.1f}s", flush=True)
    got = client.decrypt(responses[0], [indices[0]], sk)
    assert got[0][:1] == database[indices[0]], "PIR answer mismatch"

    best = 0.0
    for window in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            responses = server.compute_response_batch(queries, ek)
        jax.block_until_ready(responses[-1].ciphertexts[0][0].polys[0].data)
        qps = B * 3 / (time.perf_counter() - t0)
        best = max(best, qps)
        print(f"window {window}: {qps:.2f} q/s", flush=True)
    print(f"XLA:CPU MulPIR ({entries} entries): {best:.2f} q/s on "
          f"{n_cores} cores = {best/n_cores:.2f} q/s/core", flush=True)
    print(f"=> 16-core reference-host bound: {16*best/n_cores:.1f} q/s", flush=True)


if __name__ == "__main__":
    main()

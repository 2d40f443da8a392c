"""Measured XLA:CPU anchors for the PNNS baselines (w32 and w64).

Runs the exact PNNS serving workload of bench.bench_pnns / bench_pnns_w64
(4096 x 128-dim cosine similarity, N=4096 q=27/28/28, t 17-bit) on XLA:CPU
and reports q/s per core plus the 16-core reference-host bound. Same
derivation logic as cpu_baseline.py; the reference benchmarks this exact
config (PnnsBenchmarkUtilities.swift:51, PnnsBenchmark.swift:22-28).

Usage: JAX_PLATFORMS=cpu python benchmarks/cpu_baseline_pnns.py [rows] [batch] [w64?]
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
from she_tpu.pnns import pnns, serving as pnns_serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def run(scalar_bits: int, db_rows: int, dim: int, B: int):
    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    n_cores = os.cpu_count()
    ep = paramsmod.from_predefined(
        "n_4096_logq_27_28_28_logt_17", scalar_bits=scalar_bits
    )
    ctx = bfv.get_bfv_context(ep)
    sf = pnns.max_scaling_factor(dim, [ctx.plaintext_modulus])
    pt_dims = pnns.MatrixDimensions(db_rows, dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, 1)
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config,
        pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(dim)),
    )
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((db_rows, dim)).astype(np.float32)
    db = pnns.Database(
        [pnns.DatabaseRow(i, b"", vectors[i]) for i in range(db_rows)]
    )
    t0 = time.perf_counter()
    processed = pnns.process_database(db, server_config)
    print(f"w{scalar_bits}: DB processed in {time.perf_counter()-t0:.1f}s", flush=True)
    client = pnns.Client(client_config)
    sk = client.generate_secret_key(det(b"s"))
    ek = client.generate_evaluation_key(sk, det(b"k"))
    server = pnns_serving.BatchedPnnsServer(processed)
    queries = [
        client.generate_query(
            rng.standard_normal((1, dim)).astype(np.float32),
            sk,
            err_rng=det(bytes([i])),
        )
        for i in range(B)
    ]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    jax.block_until_ready(
        responses[0].ciphertext_matrices[0].ciphertexts[0].polys[0].data
    )
    print(f"w{scalar_bits}: compile+first batch {time.perf_counter()-t0:.1f}s", flush=True)
    client.decrypt(responses[0], sk)
    best = 0.0
    for window in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            responses = server.compute_response_batch(queries, ek)
        jax.block_until_ready(
            responses[-1].ciphertext_matrices[0].ciphertexts[0].polys[0].data
        )
        best = max(best, B * 2 / (time.perf_counter() - t0))
        print(f"w{scalar_bits}: window {window}: {best:.3f} q/s", flush=True)
    print(
        f"XLA:CPU w{scalar_bits} PNNS ({db_rows}x{dim}): {best:.3f} q/s on "
        f"{n_cores} cores -> {best / n_cores:.4f} q/s/core; "
        f"16-core reference-host bound: {16 * best / n_cores:.2f} q/s",
        flush=True,
    )


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    run(32, rows, 128, batch)
    run(64, rows, 128, batch)

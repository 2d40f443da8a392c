"""Mesh-scaling shape of batch-parallel MulPIR serving.

Multi-chip hardware is not reachable from this environment (one real v5e
chip over a tunnel), so the scaling SHAPE is measured on the virtual CPU
mesh: the same SPMD program (query batch sharded over the mesh axis, XLA
partitioning the whole pipeline) at 1, 2, 4, 8 devices with the per-device
batch held fixed (weak scaling — queries/sec should grow ~linearly since
the pipeline has no cross-query communication). The absolute single-chip
TPU number comes from bench.py; BASELINE.md combines the two.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling_bench.py [entries] [per_device_batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

# the container's sitecustomize pins jax_platforms to "axon,cpu"; the env
# var alone does not override it (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.parallel import mesh as meshmod
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def main():
    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    entries = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    per_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))
    config = ip.IndexPirConfig(
        entry_count=entries, entry_size_in_bytes=1, dimension_count=2,
        batch_size=1, uneven_dimensions=True,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION)
    parameter = ip.generate_parameter(config, ctx)
    rng = np.random.default_rng(0)
    database = [bytes([v]) for v in rng.integers(0, 256, size=entries, dtype=np.uint8)]
    t0 = time.perf_counter()
    processed = ip.MulPirServer.process(database, ctx, parameter)
    print(f"DB processed in {time.perf_counter()-t0:.1f}s "
          f"({processed.count} plaintexts, dims {parameter.dimensions})", flush=True)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det(b"k"))
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])

    n_devices = len(jax.devices())
    results = {}
    sizes = [s for s in (1, 2, 4, 8) if s <= n_devices]
    for n_dev in sizes:
        B = per_dev * n_dev
        mesh = meshmod.make_mesh(n_dev, "batch")
        indices = [int(rng.integers(0, entries)) for _ in range(B)]
        queries = [client.generate_query([i], sk) for i in indices]
        t0 = time.perf_counter()
        responses = meshmod.batch_parallel_response(server, queries, ek, mesh)
        np.asarray(responses[0].ciphertexts[0][0].polys[0].data[..., :2])
        compile_s = time.perf_counter() - t0
        got = client.decrypt(responses[0], [indices[0]], sk)
        assert got[0][:1] == database[indices[0]], "scaling bench mismatch"
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                responses = meshmod.batch_parallel_response(server, queries, ek, mesh)
            np.asarray(responses[-1].ciphertexts[0][0].polys[0].data[..., :2])
            best = max(best, B * 3 / (time.perf_counter() - t0))
        results[n_dev] = best
        speedup = best / results[sizes[0]]
        print(f"devices={n_dev} batch={B}: {best:.2f} q/s "
              f"({speedup:.2f}x vs {sizes[0]}-device; compile {compile_s:.0f}s)",
              flush=True)

    # --- 2-axis (batch, db) composed program ------------------------------
    d0 = parameter.dimensions[0]
    shapes = []
    for sb, sd in ((4, 2), (2, 4), (2, 2)):
        if (
            sb * sd <= n_devices
            and d0 % sd == 0
            and all(dim % sd == 0 for dim in parameter.dimensions[1:])
        ):
            shapes.append((sb, sd))
    for sb, sd in shapes:
        B = per_dev * sb
        devices = np.array(jax.devices()[: sb * sd]).reshape(sb, sd)
        mesh2 = jax.sharding.Mesh(devices, ("batch", "db"))
        indices = [int(rng.integers(0, entries)) for _ in range(B)]
        queries = [client.generate_query([i], sk) for i in indices]
        t0 = time.perf_counter()
        out = meshmod.two_axis_response(server, queries, ek, mesh2)
        np.asarray(out[0][0][..., :2])
        compile_s = time.perf_counter() - t0
        responses = server._assemble_responses(out, B)
        got = client.decrypt(responses[0], [indices[0]], sk)
        assert got[0][:1] == database[indices[0]], "2-axis scaling mismatch"
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                out = meshmod.two_axis_response(server, queries, ek, mesh2)
            np.asarray(out[0][0][..., :2])
            best = max(best, B * 3 / (time.perf_counter() - t0))
        print(f"2-axis mesh (batch={sb} x db={sd}) B={B}: {best:.2f} q/s",
              flush=True)


if __name__ == "__main__":
    main()

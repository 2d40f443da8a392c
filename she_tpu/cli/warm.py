"""she-tpu-warm: pre-populate the XLA compile cache for a serving config.

The w64 staged serving pipelines cost minutes of XLA:TPU compile time on a
cold cache (docs/ARCHITECTURE.md "Compilation strategy"); a fleet rollout
or cache eviction would otherwise pay that on the serving path. This tool
builds the exact serving programs for a (parameter set, database shape,
batch) configuration against a synthetic database and drives one batch
through them, so every stage executable lands in the persistent disk cache
(`~/.cache/she_tpu_jax`) before production traffic arrives.

Production analogue of the reference's processed-database save/load
startup path (IndexPirProtocol.swift:249-379): there the expensive
precompute is serialized; here the expensive artifact is the compiled XLA
program, and this is its "save".

Usage:
  she-tpu-warm pir  --params n_8192_logq_3x55_logt_24 --scalar-bits 64 \
      --entries 1000000 --entry-size 1 --batch 16
  she-tpu-warm pnns --params n_4096_logq_27_28_28_logt_17 --scalar-bits 64 \
      --rows 4096 --dim 128 --batch 8
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence(x):
    return np.asarray(x[..., :2])


def warm_pir(args) -> None:
    from .. import params as paramsmod
    from ..bfv import bfv
    from ..pir import index_pir as ip, serving
    from ..rng.ctr_drbg import nist_aes128_ctr

    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    ep = paramsmod.from_predefined(args.params, scalar_bits=args.scalar_bits)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"warm-sk"))
    config = ip.IndexPirConfig(
        entry_count=args.entries,
        entry_size_in_bytes=args.entry_size,
        dimension_count=args.dims,
        batch_size=1,
        uneven_dimensions=True,
        key_compression=ip.PirKeyCompression[args.key_compression],
    )
    parameter = ip.generate_parameter(config, ctx)
    _log(f"warming PIR dims={parameter.dimensions} "
         f"expanded={parameter.expanded_query_count} batch={args.batch}")
    rng = np.random.default_rng(0)
    values = rng.integers(0, 256, size=args.entries, dtype=np.uint8)
    database = [bytes([v]) * args.entry_size for v in values]
    t0 = time.perf_counter()
    processed = ip.MulPirServer.process(database, ctx, parameter)
    _log(f"db processed in {time.perf_counter() - t0:.1f}s")
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det(b"warm-ek"))
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])
    queries = [client.generate_query([i], sk) for i in range(args.batch)]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    _fence(responses[0].ciphertexts[0][0].polys[0].data)
    dt = time.perf_counter() - t0
    got = client.decrypt(responses[0], [0], sk)
    assert got[0][: args.entry_size] == database[0], "warm-run decrypt mismatch"
    _log(f"serving programs compiled + first batch in {dt:.1f}s; cache warm")


def warm_pnns(args) -> None:
    from .. import params as paramsmod
    from ..bfv import bfv
    from ..pnns import pnns, serving as pnns_serving
    from ..rng.ctr_drbg import nist_aes128_ctr

    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    ep = paramsmod.from_predefined(args.params, scalar_bits=args.scalar_bits)
    ctx = bfv.get_bfv_context(ep)
    sf = pnns.max_scaling_factor(args.dim, [ctx.plaintext_modulus])
    pt_dims = pnns.MatrixDimensions(args.rows, args.dim)
    ek_config = pnns.matmul_evaluation_key_config(ctx, pt_dims, 1)
    client_config = pnns.ClientConfig.create(
        ep, sf, pnns.MatrixPacking.dense_row(), args.dim, ek_config
    )
    server_config = pnns.ServerConfig(
        client_config,
        pnns.MatrixPacking.diagonal(pnns.BabyStepGiantStep.create(args.dim)),
    )
    _log(f"warming PNNS {args.rows}x{args.dim} batch={args.batch}")
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    db = pnns.Database(
        [pnns.DatabaseRow(i, b"", vectors[i]) for i in range(args.rows)]
    )
    t0 = time.perf_counter()
    processed = pnns.process_database(db, server_config)
    _log(f"db processed in {time.perf_counter() - t0:.1f}s")
    client = pnns.Client(client_config)
    sk = client.generate_secret_key(det(b"warm-sk"))
    ek = client.generate_evaluation_key(sk, det(b"warm-ek"))
    server = pnns_serving.BatchedPnnsServer(processed)
    queries = [
        client.generate_query(
            rng.standard_normal((1, args.dim)).astype(np.float32),
            sk,
            err_rng=det(bytes([i % 256])),
        )
        for i in range(args.batch)
    ]
    t0 = time.perf_counter()
    responses = server.compute_response_batch(queries, ek)
    _fence(responses[0].ciphertext_matrices[0].ciphertexts[0].polys[0].data)
    dt = time.perf_counter() - t0
    client.decrypt(responses[0], sk)
    _log(f"serving programs compiled + first batch in {dt:.1f}s; cache warm")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="she-tpu-warm", description=__doc__.split("\n")[0]
    )
    sub = parser.add_subparsers(dest="mode", required=True)
    pir = sub.add_parser("pir", help="warm a MulPIR serving config")
    pir.add_argument("--params", default="n_4096_logq_27_28_28_logt_5")
    pir.add_argument("--scalar-bits", type=int, default=32)
    pir.add_argument("--entries", type=int, default=1_000_000)
    pir.add_argument("--entry-size", type=int, default=1)
    pir.add_argument("--dims", type=int, default=2)
    pir.add_argument("--batch", type=int, default=128)
    pir.add_argument(
        "--key-compression",
        default="NO_COMPRESSION",
        choices=["NO_COMPRESSION", "HYBRID", "MAX"],
    )
    pnns_p = sub.add_parser("pnns", help="warm a PNNS serving config")
    pnns_p.add_argument("--params", default="n_4096_logq_27_28_28_logt_17")
    pnns_p.add_argument("--scalar-bits", type=int, default=32)
    pnns_p.add_argument("--rows", type=int, default=4096)
    pnns_p.add_argument("--dim", type=int, default=128)
    pnns_p.add_argument("--batch", type=int, default=16)
    args = parser.parse_args(argv)
    t0 = time.perf_counter()
    if args.mode == "pir":
        warm_pir(args)
    else:
        warm_pnns(args)
    _log(f"total warm time {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Serialization micro-benchmarks, mirroring the reference suite
(Benchmarks/SerializationBenchmark/SerializationBenchmark.swift): ciphertext
serialize/deserialize (full, seeded, forDecryption/skipLSBs) and
evaluation-key serialize/deserialize at the RlweBenchmark configs
(N=8192 3x55-bit u64 set and the N=4096 27/28/28 u32 set).

Run: python benchmarks/serialization_bench.py [--iters 20]
Host-side CPU work (bit packing) — backend-independent.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, iters):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    return (time.perf_counter() - t0) / iters, out


def bench_config(name: str, scalar_bits: int, iters: int):
    from she_tpu import params as paramsmod
    from she_tpu.bfv import bfv, keys
    from she_tpu.io import serialize as ser
    from she_tpu.rng.ctr_drbg import nist_aes128_ctr

    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    ep = paramsmod.from_predefined(name, scalar_bits=scalar_bits)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))
    rng = np.random.default_rng(0)
    vals = [int(v) for v in rng.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    pt = bfv.encode(ctx, vals)
    ct_seeded = bfv.encrypt(pt, sk, seed=b"\x11" * 32, err_rng=det(b"e"))
    ct_full = bfv.ct_add(ct_seeded, ct_seeded)  # drops the seed
    ek = keys.generate_evaluation_key(
        ctx,
        keys.EvaluationKeyConfig(
            galois_elements=[3], has_relinearization_key=True
        ),
        sk,
        det(b"k"),
    )

    print(f"== {name} (w{scalar_bits}) ==")
    t, blob = timeit(lambda: ser.serialize_ciphertext(ct_full), iters)
    print(f"ciphertext serialize (full):        {t * 1e3:8.2f} ms  ({len(blob.polys)} B)")
    t, _ = timeit(
        lambda: ser.deserialize_ciphertext(blob, ctx, "coeff"), iters
    )
    print(f"ciphertext deserialize (full):      {t * 1e3:8.2f} ms")
    t, sblob = timeit(lambda: ser.serialize_ciphertext(ct_seeded), iters)
    print(f"ciphertext serialize (seeded):      {t * 1e3:8.2f} ms  ({len(sblob.polys)} B)")
    t, _ = timeit(
        lambda: ser.deserialize_ciphertext(sblob, ctx, "coeff"),
        iters,
    )
    print(f"ciphertext deserialize (seeded):    {t * 1e3:8.2f} ms  (DRBG re-expansion)")
    single = bfv.mod_switch_down_to_single(ct_full)
    t, dblob = timeit(
        lambda: ser.serialize_ciphertext(single, for_decryption=True), iters
    )
    print(f"ciphertext serialize forDecryption: {t * 1e3:8.2f} ms  ({len(dblob.polys)} B, skipLSBs)")
    t, ekblob = timeit(lambda: ser.serialize_evaluation_key(ek), iters)
    print(f"evaluation key serialize:           {t * 1e3:8.2f} ms")
    t, _ = timeit(lambda: ser.deserialize_evaluation_key(ekblob, ctx), iters)
    print(f"evaluation key deserialize:         {t * 1e3:8.2f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    bench_config("n_4096_logq_27_28_28_logt_16", 32, args.iters)
    bench_config("n_8192_logq_3x55_logt_42", 64, args.iters)


if __name__ == "__main__":
    main()

"""RLWE micro-benchmarks, mirroring the reference suites
(Benchmarks/PolyBenchmark/PolyBenchmark.swift:22-39 and
Benchmarks/RlweBenchmark/RlweBenchmark.swift:27-110):

* Poly ops (add / eval-multiply / forward+inverse NTT) at N=8192,
  u32 modulus (1<<28)-65535 and u64 3x55-bit set.
* BFV ops (encode, encrypt, decrypt, ct+ct, ct*pt, ct*ct, relinearize,
  rotate, modSwitchDown) at the reference benchmark configs.

Run: python benchmarks/rlwe_bench.py [--batch 16] [--iters 10]
Times are per-op at the given batch (amortized), on whatever backend JAX
selects (TPU if available).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_poly(batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from she_tpu.ops import ntt as nttmod
    from she_tpu.ops import word as wordmod
    from she_tpu.core.context import get_poly_context
    from she_tpu.core import poly as polymod

    results = []
    for label, moduli, bits in [
        ("u32 N=8192 q=(1<<28)-65535", ((1 << 28) - 65535,), 32),
        ("u64 N=8192 3x55-bit", ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327), 64),
    ]:
        ctx = get_poly_context(8192, moduli, bits)
        tables = ctx.ntt_tables
        rng = np.random.default_rng(0)
        vals = np.zeros((batch, len(moduli), 8192), dtype=object)
        for i, q in enumerate(moduli):
            vals[:, i] = rng.integers(0, q, size=(batch, 8192)).astype(object)
        x = jnp.asarray(wordmod.pack(vals, ctx.nlimbs))
        w = lambda a: tuple(a[i] for i in range(ctx.nlimbs))

        fwd = jax.jit(lambda a: jnp.stack(nttmod.forward_ntt(w(a), tables)))
        inv = jax.jit(lambda a: jnp.stack(nttmod.inverse_ntt(w(a), tables)))
        qarr = jnp.asarray(ctx.q_arr)
        addf = jax.jit(
            lambda a, b: jnp.stack(
                ctx.word.add_mod(w(a), w(b), wordmod.as_word(qarr))
            )
        )
        ev = fwd(x)
        results.append((f"{label} fwdNTT", timeit(fwd, x, iters=iters) / batch))
        results.append((f"{label} invNTT", timeit(inv, ev, iters=iters) / batch))
        results.append((f"{label} add", timeit(addf, x, x, iters=iters) / batch))
    return results


def bench_bfv(batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from she_tpu import params as paramsmod
    from she_tpu.bfv import bfv, keys
    from she_tpu.rng.ctr_drbg import nist_aes128_ctr

    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    results = []
    ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))
    ek = keys.generate_evaluation_key(
        ctx, keys.EvaluationKeyConfig(galois_elements=(3,), has_relinearization_key=True),
        sk, det(b"k"),
    )
    rng = np.random.default_rng(0)
    vals = [int(v) for v in rng.integers(0, ctx.plaintext_modulus, size=ctx.degree)]
    pt = bfv.encode(ctx, vals)
    ct1 = bfv.encrypt(pt, sk, err_rng=det(b"1"))
    ct2 = bfv.encrypt(pt, sk, err_rng=det(b"2"))
    pt_eval = bfv.plaintext_to_eval(ctx, pt)
    ct_eval = bfv.ct_to_eval(ct1)

    # jitted single-op wrappers (batch amortization via vmap)
    def stack_ct(ct, n):
        return jax.tree_util.tree_map(lambda x: jnp.stack([x] * n), ct)

    cts1 = stack_ct(ct1, batch)
    cts2 = stack_ct(ct2, batch)
    ctse = stack_ct(ct_eval, batch)

    ops = {
        "ct+ct": jax.jit(jax.vmap(bfv.ct_add)),
        "ct*pt (eval)": jax.jit(jax.vmap(lambda a: bfv.ct_mul_pt(a, pt_eval))),
        "ct*ct (BEHZ)": jax.jit(jax.vmap(bfv.ct_mul)),
        "ct*ct+relin": jax.jit(jax.vmap(lambda a, b: bfv.ct_mul_relin(a, b, ek))),
        "applyGalois": jax.jit(jax.vmap(lambda a: bfv.apply_galois(a, 3, ek))),
        "modSwitchDown": jax.jit(jax.vmap(bfv.mod_switch_down)),
    }
    for name, fn in ops.items():
        if name in ("ct+ct",):
            t = timeit(fn, cts1, cts2, iters=iters) / batch
        elif name in ("ct*ct (BEHZ)", "ct*ct+relin"):
            t = timeit(fn, cts1, cts2, iters=iters) / batch
        elif name == "ct*pt (eval)":
            t = timeit(fn, ctse, iters=iters) / batch
        else:
            t = timeit(fn, cts1, iters=iters) / batch
        results.append((f"BFV N=4096 w32 {name}", t))

    # host-path ops (per op, unbatched; warm up compiles first)
    bfv.encrypt(pt, sk, err_rng=det(b"w"))
    bfv.decrypt(ct1, sk)
    t0 = time.perf_counter()
    for _ in range(5):
        bfv.encrypt(pt, sk, err_rng=det(b"x"))
    results.append(("BFV N=4096 w32 encrypt (incl. host DRBG)", (time.perf_counter() - t0) / 5))
    t0 = time.perf_counter()
    for _ in range(5):
        bfv.decrypt(ct1, sk)
    results.append(("BFV N=4096 w32 decrypt", (time.perf_counter() - t0) / 5))

    # ContextInit / keygen / encode / decode (RlweBenchmark.swift:27-110)
    t0 = time.perf_counter()
    bfv.get_bfv_context(ep)
    results.append(("BFV N=4096 w32 ContextInit (cold)", time.perf_counter() - t0))
    t0 = time.perf_counter()
    for _ in range(5):
        bfv.generate_secret_key(ctx, det(b"g"))
    results.append(("BFV N=4096 w32 secretKey gen", (time.perf_counter() - t0) / 5))
    t0 = time.perf_counter()
    keys.generate_evaluation_key(
        ctx,
        keys.EvaluationKeyConfig(galois_elements=(3,), has_relinearization_key=True),
        sk,
        det(b"h"),
    )
    results.append(("BFV N=4096 w32 evaluationKey gen", time.perf_counter() - t0))
    bfv.encode(ctx, vals)  # warm: drain pending async device work
    t0 = time.perf_counter()
    for _ in range(10):
        bfv.encode(ctx, vals)
    results.append(("BFV N=4096 w32 encode (coeff)", (time.perf_counter() - t0) / 10))
    bfv.decode(ctx, pt)
    t0 = time.perf_counter()
    for _ in range(10):
        bfv.decode(ctx, pt)
    results.append(("BFV N=4096 w32 decode (coeff)", (time.perf_counter() - t0) / 10))
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--skip-bfv", action="store_true")
    args = parser.parse_args()
    rows = bench_poly(args.batch, args.iters)
    if not args.skip_bfv:
        rows += bench_bfv(args.batch, args.iters)
    width = max(len(r[0]) for r in rows)
    for name, t in rows:
        per_sec = 1.0 / t if t > 0 else float("inf")
        print(f"{name:<{width}}  {t * 1e6:10.1f} us/op  {per_sec:12.0f} ops/s")


if __name__ == "__main__":
    main()

"""Per-op XLA:CPU anchors for the w64 MulPIR baseline model.

The full w64 pipeline cannot be fairly measured on XLA:CPU (the staged
compile is pathological at N=8192 and the eager executor is dispatch-bound,
under-estimating a real CPU implementation), so the w64 denominator is a
MODEL built from per-op anchors, each measured here as a single compiled
XLA:CPU program (no dispatch overhead, AVX-512 vector code — per core at
least as fast as the reference's scalar Swift loops):

  per w64 query (dims (11,4), N=8192, L=2+1):
    14 Galois key-switches (oblivious expansion)
  + 22 forward NTTs ([L=2, 8192], dim-0 query cts)
  + 44 ct-pt MACs + reduction (dim-0, 44 database plaintexts x 2 polys)
  + 4 BEHZ ct-ct multiplies + 1 relinearization + 1 modSwitch (dims1)

Usage: JAX_PLATFORMS=cpu python benchmarks/cpu_baseline_w64_ops.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.ops import ntt as nttmod, word as wordmod
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
n_cores = os.cpu_count()

ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=64)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
ek = keys.generate_evaluation_key(
    ctx,
    keys.EvaluationKeyConfig(
        galois_elements=(ctx.degree // 2 + 1,), has_relinearization_key=True
    ),
    sk,
    det(b"k"),
)
ct_ctx = ctx.ciphertext_context
L, N = len(ct_ctx.moduli), ctx.degree
rng = np.random.default_rng(0)
pt = bfv.encode(ctx, [int(v) for v in rng.integers(0, ctx.plaintext_modulus, N)])
ct = bfv.encrypt(pt, sk, err_rng=det(b"1"))


def timed(name, fn, *args, n=3):
    y = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(y)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(y)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


# 1. forward NTT over the ciphertext context rows
tables = ct_ctx.ntt_tables
data = jnp.asarray(ct.polys[0].data)


@jax.jit
def fwd(x):
    w = tuple(x[i] for i in range(2))
    return jnp.stack(nttmod.forward_ntt(w, tables))


t_ntt = timed(f"fwd NTT [L={L}, {N}] w64", fwd, data)

# 2. one Galois key-switch (apply_galois)
element = ctx.degree // 2 + 1
ks = jax.jit(lambda c, k: bfv.apply_galois(c, element, k))
t_ks = timed("apply_galois (1 key-switch)", ks, ct, ek)

# 3. ct-pt multiply in Eval (1 plaintext x 1 ciphertext, 2 polys) + add
ct_eval = bfv.ct_to_eval(ct)
pt_eval = bfv.plaintext_to_eval(
    ctx, bfv.encode(ctx, [1, 2, 3]), len(ct_ctx.moduli)
)
mul = jax.jit(lambda c, p: bfv.ct_mul_pt(c, p))
t_mac = timed("ct-pt Eval multiply", mul, ct_eval, pt_eval)

# 4./5. BEHZ ct-ct + relin and modSwitch are NOT anchored here: the fused
# w64 BEHZ graph is pathological for XLA:CPU's backend (>40 min compile;
# same pathology as the skipped sharded-w64 test). The NTT/KS/MAC anchors
# above already demonstrate the point recorded in BASELINE.md: the
# u32-limb formulation UNDER-estimates a native-64-bit CPU (a SEAL-class
# native NTT is ~40x faster than the 25 ms measured here), so none of
# these anchors are used as baseline denominators — the w64 denominator is
# the literature-anchored model in bench.py.
print("(BEHZ/modswitch anchors skipped: pathological XLA:CPU compile)", flush=True)

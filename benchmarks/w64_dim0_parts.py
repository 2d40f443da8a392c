"""Decompose the w64 dim-0 stage cost: query ct_to_eval NTTs vs MXU digit
einsums vs multi-limb accumulate/reduce, at the w64 bench shapes
(N=8192, L=3x55-bit, d0=11, C=4, B=16)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.core.poly import COEFF, EVAL, PolyRq
from she_tpu.core import poly as polymod
from she_tpu.ops import ntt_mxu, word as wordmod
from she_tpu.pir import serving

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
d0, C = 11, 4
ep = paramsmod.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=64)
ctx = bfv.get_bfv_context(ep)
ct_ctx = ctx.ciphertext_context
L, N, W = len(ct_ctx.moduli), ct_ctx.degree, ct_ctx.nlimbs
rng = np.random.default_rng(0)

# fake db chunk + queries with valid ranges
chunk = np.zeros((C, d0, W, L, N), dtype=np.uint32)
for i, q in enumerate(ct_ctx.moduli):
    v = rng.integers(0, q, size=(C, d0, N)).astype(object)
    chunk[:, :, 0, i] = (v & 0xFFFFFFFF).astype(np.uint32)
    chunk[:, :, 1, i] = (v >> 32).astype(np.uint32)
db_digits = jnp.asarray(serving.pack_database_chunk_digits(chunk, ct_ctx))

# expanded query tensor [d0, B, polys=2, W, L, N] in COEFF
exp = np.zeros((d0, B, 2, W, L, N), dtype=np.uint32)
for i, q in enumerate(ct_ctx.moduli):
    v = rng.integers(0, q, size=(d0, B, 2, N)).astype(object)
    exp[:, :, :, 0, i] = (v & 0xFFFFFFFF).astype(np.uint32)
    exp[:, :, :, 1, i] = (v >> 32).astype(np.uint32)
exp = jnp.asarray(exp)


def fence(x):
    return np.asarray(x[..., :2])


def timed(name, fn, *args, n=5):
    y = fn(*args)
    fence(jax.tree_util.tree_leaves(y)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    fence(jax.tree_util.tree_leaves(y)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s}: {dt*1e3:7.2f} ms", flush=True)
    return y


# 1. forward NTT of all query polys (the ct_to_eval part)
@jax.jit
def fwd_all(exp):
    from she_tpu.ops import ntt as nttmod
    w = (exp[:, :, :, 0], exp[:, :, :, 1])  # [d0, B, 2, L, N] each
    out = nttmod.forward_ntt(w, ct_ctx.ntt_tables)
    return jnp.stack(out, axis=3)

evaled = timed("fwd NTT (d0*B*2 polys)", fwd_all, exp)

# 2. full dim0 (mxu) for one batch: [d0, P=2B, W, L, N] query layout
q_eval = jnp.reshape(
    jnp.transpose(evaled, (0, 2, 1, 3, 4, 5)), (d0, 2 * B, W, L, N)
)

@jax.jit
def dim0_full(q_eval):
    return serving.dim0_inner_products_mxu(db_digits, q_eval, ct_ctx)

timed("dim0 MXU full (digits+mac+reduce)", dim0_full, q_eval)

# 3. einsums only (digit extraction + matmuls, no accumulate/reduce)
@jax.jit
def einsums_only(q_eval):
    D = db_digits.shape[0]
    qd = serving._query_digits(q_eval, D)
    total = None
    for i in range(D):
        for j in range(D):
            p = jnp.einsum("lncj,lnjp->lncp", db_digits[i], qd[j],
                           preferred_element_type=jnp.int32)
            total = p if total is None else total + p
    return total

timed("einsums only (64 digit matmuls)", einsums_only, q_eval)

# 4. accumulate+reduce only (feed precomputed partials)
D = db_digits.shape[0]
qd0 = serving._query_digits(q_eval, D)
partials_list = []
for k in range(2 * D - 1):
    p = None
    for i in range(max(0, k - D + 1), min(D, k + 1)):
        t = jnp.einsum("lncj,lnjp->lncp", db_digits[i], qd0[k - i],
                       preferred_element_type=jnp.int32)
        p = t if p is None else p + t
    partials_list.append(np.asarray(p))
partials_host = [jnp.asarray(p) for p in partials_list]

@jax.jit
def acc_reduce(partials):
    qmax = max(int(q) for q in ct_ctx.moduli)
    bound_bits = (d0 * (qmax - 1) * (qmax - 1)).bit_length()
    acc = ntt_mxu._accumulate_partials(partials, ntt_mxu._acc_limbs_for(bound_bits))
    acc = [jnp.transpose(a, (2, 3, 0, 1)) for a in acc]
    los, his = [], []
    for row in range(L):
        rc = ct_ctx.row_consts[row]
        consts = {
            "k": rc["k"],
            "mu32": np.uint32(rc["mu32"]),
            "r32": ct_ctx.row_word("r32", row),
            "r32_shoup": ct_ctx.row_word("r32_shoup", row),
        }
        racc = [a[..., row, :] for a in acc]
        lo, hi = serving._reduce_acc_limbs_w64_row(
            racc, ct_ctx.row_word("q", row), consts
        )
        los.append(lo)
        his.append(hi)
    return jnp.stack([jnp.stack(los, axis=-2), jnp.stack(his, axis=-2)], axis=2)

timed("accumulate+reduce only", acc_reduce, partials_host)

# 4b. VPU (u128 limb MAC) dim0 for comparison — at w64's small d0/C the
# MXU digit machinery may lose to the plain lazy-accumulator kernel
chunk_dev = jnp.asarray(chunk)


@jax.jit
def dim0_vpu(q_eval):
    return serving.dim0_inner_products(chunk_dev, q_eval, ct_ctx)


r_vpu = timed("dim0 VPU full (u128 MAC+reduce)", dim0_vpu, q_eval)

# 5. inverse NTT of results [C, P, W, L, N]
res = dim0_full(q_eval)
assert (np.asarray(r_vpu) == np.asarray(res)).all(), "VPU/MXU dim0 mismatch"

@jax.jit
def inv_all(res):
    from she_tpu.ops import ntt as nttmod
    w = (res[:, :, 0], res[:, :, 1])
    out = nttmod.inverse_ntt(w, ct_ctx.ntt_tables)
    return jnp.stack(out, axis=2)

timed("inverse NTT (C*P polys)", inv_all, res)

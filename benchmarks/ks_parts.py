"""Key-switch component timings at expansion-level batch shapes.

Expansion = 63 batched Galois key-switches per query and dominates PIR
serving; this isolates where the time goes inside one batched
apply_galois: permutation, digit broadcast+reduce, forward NTTs, MAC,
inverse NTT, divide-and-round. Batch = 1024 ciphertexts (level 6 of a
B=32 batch).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv, keys
from she_tpu.core import poly as polymod
from she_tpu.core.context import get_poly_context
from she_tpu.core.poly import COEFF, EVAL, PolyRq
from she_tpu.ops import galois as galoismod
from she_tpu.ops import limb, ntt as nttmod, word as wordmod
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
ek = keys.generate_evaluation_key(
    ctx,
    keys.EvaluationKeyConfig(galois_elements=(ctx.degree // 2 + 1,)),
    sk,
    det(b"k"),
)
element = ctx.degree // 2 + 1
ct_ctx = ctx.ciphertext_context
L, N = len(ct_ctx.moduli), ct_ctx.degree
rng = np.random.default_rng(0)
pt = bfv.encode(ctx, [int(v) for v in rng.integers(0, ctx.plaintext_modulus, N)])
ct = bfv.encrypt(pt, sk, err_rng=det(b"1"))
data = jnp.broadcast_to(
    jnp.stack([p.data for p in ct.polys])[None], (B, 2, 1, L, N)
)
data = jnp.asarray(data)


def fence(y):
    """Tiny host fetch — the tunnel acks enqueue on block_until_ready, so
    only a fetch proves execution finished (bench.py:fence)."""
    leaf = jax.tree_util.tree_leaves(y)[0]
    return np.asarray(leaf.ravel()[:2])


def timeit(label, fn, *args, n=5):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    y = f(*args)
    fence(y)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    fence(y)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:.2f} ms/call (B={B}; compile {compile_s:.0f}s)",
          flush=True)
    return y


def mk_ct(per):
    return bfv.Ciphertext(ctx, [PolyRq(per[p], ct_ctx, COEFF) for p in range(2)])


# 1. full batched apply_galois (the expansion level step)
timeit(
    "apply_galois (full ks)",
    lambda d: jax.vmap(
        lambda per: jnp.stack(
            [p.data for p in bfv.apply_galois(mk_ct(per), element, ek).polys]
        )
    )(d),
    data,
)

# 2. Galois permutation only (coeff map on both polys)
qw = tuple(jnp.asarray(ct_ctx.q_arr)[l] for l in range(ct_ctx.nlimbs))
timeit(
    "galois permute only",
    lambda d: jax.vmap(
        lambda per: jnp.stack(
            [
                galoismod.apply_galois_coeff(
                    (per[p][0],), qw, element, ct_ctx.word
                )[0]
                for p in range(2)
            ]
        )
    )(d),
    data,
)

# 3. forward NTT volume of one ks: [L_t digits, L_ks rows, N] per ct
ks_ctx = ctx.key_switching_contexts[L - 1]
dig = jnp.broadcast_to(data[:, 1, 0][:, :, None, :], (B, L, len(ks_ctx.moduli), N))
dig = jnp.asarray(dig)
timeit(
    "ks fwd NTTs ([Lt, Lks, N])",
    lambda d: jnp.stack(
        nttmod.forward_ntt((d,), ks_ctx.ntt_tables)
    ),
    dig,
)

# 4. inverse NTT volume: [2, L_ks, N] per ct
inv_in = jnp.asarray(jnp.broadcast_to(data[:, :, 0, :1], (B, 2, 1, N)))
inv_in2 = jnp.broadcast_to(inv_in[:, :, :1], (B, 2, len(ks_ctx.moduli), N))
timeit(
    "ks inv NTT ([2, Lks, N])",
    lambda d: jnp.stack(nttmod.inverse_ntt((jnp.asarray(d),), ks_ctx.ntt_tables)),
    jnp.asarray(inv_in2),
)

# 5. the MAC: per component, per digit j: mul32 + u64 accumulate + reduce
kd = [
    jnp.stack(
        [ek.galois_key.keys[element].ciphertexts[j].polys[c].data[0] for c in range(2)]
    )
    for j in range(L)
]  # [2, L_top, N] each


def mac(d):
    # d: [B, Lt, Lks, N] "ntt'd digits"
    outs = []
    for comp in range(2):
        acc_lo = acc_hi = None
        for j in range(L):
            krows = jnp.concatenate([kd[j][comp][:L], kd[j][comp][-1:]], axis=0)
            lo, hi = limb.mul32(d[:, j], krows)
            if acc_lo is None:
                acc_lo, acc_hi = lo, hi
            else:
                s = acc_lo + lo
                carry = (s < acc_lo).astype(jnp.uint32)
                acc_lo, acc_hi = s, acc_hi + hi + carry
        outs.append((acc_lo, acc_hi))
    return jnp.stack([o[0] for o in outs]) + jnp.stack([o[1] for o in outs])


timeit("ks MAC (mul32+acc only)", mac, dig)

# 6. divide_and_round_q_last on [2, Lks, N]
dr_in = jnp.asarray(jnp.broadcast_to(data[:, :, 0][:, :, :1], (B, 2, 1, N)))


def divround(d):
    # build a ks-context poly per component and drop q_ks
    def one(per):
        outs = []
        for c in range(2):
            row = jnp.broadcast_to(per[c][:1], (len(ks_ctx.moduli), N))
            p = PolyRq(row[None], ks_ctx, COEFF)
            outs.append(polymod.divide_and_round_q_last(p).data)
        return jnp.stack(outs)

    return jax.vmap(one)(d)


timeit("divide_and_round_q_last x2", divround, dr_in)

"""Fused Pallas TPU kernel for the negacyclic NTT.

The pure-JAX NTT (ntt.py) materializes the whole tensor in HBM once per
butterfly stage — 2*log2(N) HBM round trips per transform. This kernel runs
*all* stages on a block of polynomials resident in VMEM: one HBM read, one
HBM write, bit-identical results (op-for-op the same lazy-reduction
arithmetic as ntt.py, which matches the reference
Sources/HomomorphicEncryption/PolyRq/PolyRq+Ntt.swift:237-484).

Layout strategy (TPU-first): a degree-N row is viewed as an [R, C] matrix
with C = 128 lanes, R = N/128 sublane-rows.

* "row stages" (butterfly stride t >= C): partners live in different rows of
  the same lane — the view [R, C] -> [m, 2, t/C, C] touches only leading
  axes (free on TPU) and twiddles broadcast per row.
* "lane stages" (t < C): partners sit t lanes apart in the same row. Instead
  of transposing (which forces a sublane relayout per stage — measured 4x
  slower), each stage aligns partners with a lane `roll`, computes both
  butterfly outputs at the "x" lanes, rolls the "y" output back into place,
  and selects by a static lane mask. Twiddles are dense [R, C] matrices
  precomputed host-side.

All constants are precomputed host-side at broadcast-ready ranks whose
minor dims are real (sublane, lane) data — Mosaic does not support reshapes
that introduce trailing unit dims, so the kernel never reshapes a constant.

Mosaic allocates the fully-unrolled stage pipeline's temporaries on its
VMEM stack, so the kernel iterates its DMA block one polynomial at a time
(fori_loop): stack pressure stays at a single [R, C] plane while the block
amortizes DMA.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import nt
from . import word as wordmod
from .ntt import NttTables, _lazy_sub_2q, _wrap_add, _wrap_sub

LANES = 128

_table_cache: dict = {}


def eligible(tables: NttTables) -> bool:
    return tables.degree >= 2 * LANES


def use_pallas(tables: NttTables) -> bool:
    """Dispatch policy: off by default, opt in via SHE_TPU_NTT_PALLAS=1
    (off-TPU that runs the interpreter, which the tests use).

    Measured on v5e (on-device loop, batch>=64): XLA's fusion of the staged
    pure-JAX NTT outperforms this kernel (w32 N=4096x3: 389k vs 234k
    transforms/s; w64 N=8192x3: 47k vs 31k) — the workload is VPU
    compute-bound, not HBM-bound, and the kernel's per-sub-block iteration
    (forced by Mosaic's stack allocation of the unrolled stage pipeline)
    costs more than the HBM round trips it saves. Kept as an opt-in
    alternative pending a Mosaic fix or an MXU-based redesign."""
    flag = os.environ.get("SHE_TPU_NTT_PALLAS", "auto")
    if flag != "1" or not eligible(tables):
        return False
    return True


def _expand(arr: np.ndarray, lane: int) -> np.ndarray:
    """[Wl, L, m] -> [Wl, L, m, 1, lane] (value repeated along lanes)."""
    return np.ascontiguousarray(
        np.broadcast_to(arr[:, :, :, None, None], arr.shape + (1, lane))
    )


def _stage_tables(tables: NttTables):
    """Host-side per-stage twiddle arrays keyed by (moduli, degree, nlimbs)."""
    key = (tables.moduli, tables.degree, tables.nlimbs)
    hit = _table_cache.get(key)
    if hit is not None:
        return hit
    n = tables.degree
    C = LANES
    R = n // C
    log2R = nt.log2_exact(R)
    log2n = nt.log2_exact(n)

    def row_pair(roots, roots_sh, m):
        return _expand(roots[:, :, m : 2 * m], C), _expand(
            roots_sh[:, :, m : 2 * m], C
        )

    def lane_pair(roots, roots_sh, log2m):
        # dense [Wl, L, R, C]: value at (r, c) = w[m + (r*C + c) >> log2(2t)]
        m = 1 << log2m
        t = n >> (log2m + 1)
        flat = np.arange(R)[:, None] * C + np.arange(C)[None, :]
        idx = m + (flat >> (nt.log2_exact(t) + 1))
        return (
            np.ascontiguousarray(roots[:, :, idx]),
            np.ascontiguousarray(roots_sh[:, :, idx]),
        )

    qs = tables.q[:, :, 0]  # [Wl, L]
    q2s = tables.q2[:, :, 0]

    def scalar_forms(v):
        # v: [Wl, L] -> row-form [Wl,L,1,1,C] (rank-5 row-stage ops) and
        # lane-form [Wl,L,1,C] (rank-4 lane-stage ops)
        vr = np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None, None], v.shape + (1, 1, C))
        )
        vl = np.ascontiguousarray(
            np.broadcast_to(v[:, :, None, None], v.shape + (1, C))
        )
        return vr, vl

    def ninv_form(v):  # [Wl, L, 1] -> [Wl, L, 1, 1, C]
        return np.ascontiguousarray(
            np.broadcast_to(v[:, :, :, None, None], v.shape + (1, C))
        )

    prep = {
        "fwd_row": [
            row_pair(tables.roots, tables.roots_shoup, 1 << s) for s in range(log2R)
        ],
        "inv_row": [
            row_pair(tables.inv_roots, tables.inv_roots_shoup, 1 << s)
            for s in range(1, log2R)
        ],
        "fwd_lane": [
            lane_pair(tables.roots, tables.roots_shoup, s)
            for s in range(log2R, log2n)
        ],
        "inv_lane": [
            lane_pair(tables.inv_roots, tables.inv_roots_shoup, s)
            for s in range(log2R, log2n)
        ],
        "q_forms": scalar_forms(qs),
        "q2_forms": scalar_forms(q2s),
        "n_inv": ninv_form(tables.n_inv),
        "n_inv_shoup": ninv_form(tables.n_inv_shoup),
        "n_inv_w": ninv_form(tables.n_inv_w),
        "n_inv_w_shoup": ninv_form(tables.n_inv_w_shoup),
    }
    # cache holds host numpy arrays only — never trace-dependent values
    prep.update(R=R, C=C, log2R=log2R, log2n=log2n)
    _table_cache[key] = prep
    return prep


def _limbs(val, Wl):
    return tuple(val[i] for i in range(Wl))


def _roll(word, shift, axis):
    return tuple(pltpu.roll(a, shift, axis=axis) for a in word)


def _select(mask, x, y):
    return tuple(jnp.where(mask, a, b) for a, b in zip(x, y))


def _split(x, L, outer, inner, last):
    """[S, L, outer*2*inner, last] view -> halves [S, L, outer, inner, last]."""
    S = x[0].shape[0]
    xv = tuple(a.reshape(S, L, outer, 2, inner, last) for a in x)
    return (
        tuple(a[:, :, :, 0] for a in xv),
        tuple(a[:, :, :, 1] for a in xv),
    )


def _merge(new_x, new_y, L, rows, last):
    S = new_x[0].shape[0]
    return tuple(
        jnp.stack([nx, ny], axis=3).reshape(S, L, rows, last)
        for nx, ny in zip(new_x, new_y)
    )


def _butterfly_fwd(W, Wl, xx, yy, wv, wsv, qv, q2v):
    w = _limbs(wv, Wl)
    ws = _limbs(wsv, Wl)
    qb = _limbs(qv, Wl)
    q2b = _limbs(q2v, Wl)
    xx = _lazy_sub_2q(W, xx, q2b)
    tt = W.mul_shoup_lazy(yy, w, ws, qb)
    new_x = _wrap_add(W, xx, tt)
    new_y = _wrap_add(W, _wrap_sub(W, xx, tt), q2b)
    return new_x, new_y


def _butterfly_inv(W, Wl, xx, yy, wv, wsv, qv, q2v):
    w = _limbs(wv, Wl)
    ws = _limbs(wsv, Wl)
    qb = _limbs(qv, Wl)
    q2b = _limbs(q2v, Wl)
    s = _wrap_add(W, xx, yy)
    new_x = _lazy_sub_2q(W, s, q2b)
    d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)
    new_y = W.mul_shoup_lazy(d, w, ws, qb)
    return new_x, new_y


def _lane_mask(L, R, C, t):
    """True at lanes holding the butterfly 'x' element for stride t."""
    col = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, R, C), 3)
    return (col & jnp.uint32(t)) == 0


def _fwd_kernel(Wl, L, R, C, log2R, log2n, sub, x_ref, qr_ref, ql_ref, q2r_ref,
                q2l_ref, *rest):
    tw_refs = rest[:-1]
    out_ref = rest[-1]
    row_c = [r[:] for r in tw_refs[: 2 * log2R]]
    lane_c = [r[:] for r in tw_refs[2 * log2R :]]
    W = wordmod.W32 if Wl == 1 else wordmod.W64
    Bt = x_ref.shape[1]
    qr, ql = qr_ref[:], ql_ref[:]
    q2r, q2l = q2r_ref[:], q2l_ref[:]

    def body(j, _):
        x = tuple(
            x_ref[i, pl.ds(j * sub, sub)] for i in range(Wl)
        )  # [sub, L, R, C]

        # --- row stages: stride t >= C ---
        for log2m in range(log2R):
            m = 1 << log2m
            tr = R >> (log2m + 1)
            xx, yy = _split(x, L, m, tr, C)
            new_x, new_y = _butterfly_fwd(
                W, Wl, xx, yy, row_c[2 * log2m], row_c[2 * log2m + 1], qr, q2r
            )
            x = _merge(new_x, new_y, L, R, C)

        # --- lane stages: stride t < C, roll-aligned in-place ---
        for si in range(log2n - log2R):
            t = C >> (si + 1)
            is_x = _lane_mask(L, R, C, t)
            yy = _roll(x, C - t, 3)  # lane c <- x[c + t]
            new_x, new_y = _butterfly_fwd(
                W, Wl, x, yy, lane_c[2 * si], lane_c[2 * si + 1], ql, q2l
            )
            x = _select(is_x, new_x, _roll(new_y, t, 3))

        x = W.reduce_4q(x, _limbs(ql, Wl))
        for i in range(Wl):
            out_ref[i, pl.ds(j * sub, sub)] = x[i]
        return 0

    jax.lax.fori_loop(0, Bt // sub, body, 0)


def _inv_kernel(Wl, L, R, C, log2R, log2n, sub, x_ref, qr_ref, ql_ref, q2r_ref,
                q2l_ref, ninv_ref, ninv_s_ref, ninvw_ref, ninvw_s_ref, *rest):
    tw_refs = rest[:-1]
    out_ref = rest[-1]
    row_c = [r[:] for r in tw_refs[: 2 * (log2R - 1)]]
    lane_c = [r[:] for r in tw_refs[2 * (log2R - 1) :]]
    W = wordmod.W32 if Wl == 1 else wordmod.W64
    Bt = x_ref.shape[1]
    qr, ql = qr_ref[:], ql_ref[:]
    q2r, q2l = q2r_ref[:], q2l_ref[:]
    ninv = ninv_ref[:]
    ninv_s = ninv_s_ref[:]
    ninvw = ninvw_ref[:]
    ninvw_s = ninvw_s_ref[:]

    def body(j, _):
        x = tuple(
            x_ref[i, pl.ds(j * sub, sub)] for i in range(Wl)
        )  # [sub, L, R, C]

        # --- lane stages first (inverse order: t = 1 .. C/2) ---
        for si in reversed(range(log2n - log2R)):
            t = C >> (si + 1)
            is_x = _lane_mask(L, R, C, t)
            yy = _roll(x, C - t, 3)
            new_x, new_y = _butterfly_inv(
                W, Wl, x, yy, lane_c[2 * si], lane_c[2 * si + 1], ql, q2l
            )
            x = _select(is_x, new_x, _roll(new_y, t, 3))

        # --- row stages (log2m = log2R-1 .. 0); final stage folds n^-1 ---
        for log2m in reversed(range(log2R)):
            m = 1 << log2m
            tr = R >> (log2m + 1)
            xx, yy = _split(x, L, m, tr, C)
            if m > 1:
                si = log2m - 1  # inv_row list starts at m = 2
                new_x, new_y = _butterfly_inv(
                    W, Wl, xx, yy, row_c[2 * si], row_c[2 * si + 1], qr, q2r
                )
            else:
                qb = _limbs(qr, Wl)
                q2b = _limbs(q2r, Wl)
                s = _wrap_add(W, xx, yy)
                d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)
                new_x = W.mul_shoup(s, _limbs(ninv, Wl), _limbs(ninv_s, Wl), qb)
                new_y = W.mul_shoup(
                    d, _limbs(ninvw, Wl), _limbs(ninvw_s, Wl), qb
                )
            x = _merge(new_x, new_y, L, R, C)
        for i in range(Wl):
            out_ref[i, pl.ds(j * sub, sub)] = x[i]
        return 0

    jax.lax.fori_loop(0, Bt // sub, body, 0)


def _sub_block(Wl: int, n: int) -> int:
    """Polynomials per inner iteration: Mosaic's stack holds ~60x the
    working set, so keep sub * poly_bytes around a fixed budget
    (SHE_TPU_PALLAS_SUB_KB, default 64 KB)."""
    per = Wl * n * 4
    budget_kb = int(os.environ.get("SHE_TPU_PALLAS_SUB_KB", "64"))
    return max(1, (budget_kb << 10) // per)


def _batch_tile(Wl: int, n: int, B: int, sub: int) -> int:
    """Block batch size: ~1 MB of x per grid step (a multiple of the inner
    sub-block; the kernel iterates the block sub polynomials at a time, so
    VMEM stack pressure is independent of the block size)."""
    per = Wl * n * 4
    tile = max(1, min(B, (1 << 20) // per))
    return -(-tile // sub) * sub


def _run(kernel_fn, x, tables: NttTables, consts):
    Wl = tables.nlimbs
    n = tables.degree
    prep = _stage_tables(tables)
    R, C = prep["R"], prep["C"]
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xs = jnp.stack(x).reshape((Wl, -1, L, R, C))
    B = xs.shape[1]
    sub = _sub_block(Wl, n)
    Bt = _batch_tile(Wl, n, B, sub)
    Bp = -(-B // Bt) * Bt
    if Bp != B:
        xs = jnp.pad(xs, ((0, 0), (0, Bp - B), (0, 0), (0, 0), (0, 0)))

    # Grid (L, batch): batch iterates fastest so the per-L constant blocks
    # are only re-fetched when the modulus row changes.
    def const_spec(c):
        blk = (c.shape[0], 1) + c.shape[2:]
        return pl.BlockSpec(
            blk, lambda l, b: (0, l) + (0,) * (len(blk) - 2),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec(
            (Wl, Bt, 1, R, C),
            lambda l, b: (0, b, l, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + [const_spec(c) for c in consts]
    out = pl.pallas_call(
        partial(kernel_fn, Wl, 1, R, C, prep["log2R"], prep["log2n"], sub),
        grid=(L, Bp // Bt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (Wl, Bt, 1, R, C), lambda l, b: (0, b, l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Wl, Bp, L, R, C), jnp.uint32),
        interpret=jax.default_backend() != "tpu",
    )(xs, *consts)
    out = out[:, :B].reshape((Wl,) + batch + (L, n))
    return tuple(out[i] for i in range(Wl))


def forward_ntt(x, tables: NttTables):
    """Fused-kernel equivalent of ntt.forward_ntt (bit-identical)."""
    prep = _stage_tables(tables)
    qr, ql = prep["q_forms"]
    q2r, q2l = prep["q2_forms"]
    consts = [qr, ql, q2r, q2l]
    for w, ws in prep["fwd_row"]:
        consts.extend([w, ws])
    for w, ws in prep["fwd_lane"]:
        consts.extend([w, ws])
    return _run(_fwd_kernel, x, tables, consts)


def inverse_ntt(x, tables: NttTables):
    """Fused-kernel equivalent of ntt.inverse_ntt (bit-identical)."""
    prep = _stage_tables(tables)
    qr, ql = prep["q_forms"]
    q2r, q2l = prep["q2_forms"]
    consts = [
        qr,
        ql,
        q2r,
        q2l,
        prep["n_inv"],
        prep["n_inv_shoup"],
        prep["n_inv_w"],
        prep["n_inv_w_shoup"],
    ]
    for w, ws in prep["inv_row"]:
        consts.extend([w, ws])
    for w, ws in prep["inv_lane"]:
        consts.extend([w, ws])
    return _run(_inv_kernel, x, tables, consts)

"""Device negacyclic NTT over RNS limb tensors (pure JAX; Pallas variant in
ntt_pallas.py).

Design (TPU-first):
* data layout [..., L, N]: each RNS row transformed with its own twiddle
  table, all rows vectorized in one op — no per-modulus loop.
* stage s reshapes [..., L, m, 2, t] (a free row-major view: block i of the
  reference's butterfly loop occupies [2*i*t, 2*i*t + 2t)), so every stage
  is one vectorized butterfly over the whole tensor.
* Harvey lazy reduction (arXiv:1205.2926), as in the reference
  (PolyRq+Ntt.swift:237-319): forward keeps values in [0, 4q) between
  stages (one conditional-subtract of 2q per butterfly), inverse keeps
  [0, 2q); 4q < 2^32 holds because w32 moduli are < 2^30, and 4q < 2^64
  for w64 moduli < 2^62.
* twiddles are Shoup pairs precomputed on host from the *minimal primitive
  2N-th root*, bit-reversed (PolyRq+Ntt.swift:108-170) — bit-exact with the
  reference's evaluation ordering.

Values enter in [0, q) and leave fully reduced in [0, q).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..utils import nt
from ..utils.refimpl import ntt_root_tables
from . import word as wordmod
from .word import W32, W64


def _wmap(f, w):
    return tuple(f(a) for a in w)


def _wslice(w, sl):
    """Apply the same numpy-style index to each limb array."""
    return tuple(a[sl] for a in w)


@dataclass(frozen=True)
class NttTables:
    """Per-(moduli, degree) twiddle tables as stacked uint32 limb arrays.

    Shapes: roots/inv_roots [W, L, N]; scalars [W, L, 1].
    """

    degree: int
    moduli: tuple[int, ...]
    nlimbs: int
    roots: np.ndarray
    roots_shoup: np.ndarray
    inv_roots: np.ndarray
    inv_roots_shoup: np.ndarray
    n_inv: np.ndarray
    n_inv_shoup: np.ndarray
    n_inv_w: np.ndarray
    n_inv_w_shoup: np.ndarray
    q: np.ndarray
    q2: np.ndarray

    @property
    def word(self):
        return W32 if self.nlimbs == 1 else W64


@lru_cache(maxsize=None)
def build_ntt_tables(moduli: tuple[int, ...], degree: int, nlimbs: int) -> NttTables:
    bits = 32 * nlimbs
    L = len(moduli)
    roots = np.zeros((L, degree), dtype=object)
    roots_sh = np.zeros((L, degree), dtype=object)
    inv_roots = np.zeros((L, degree), dtype=object)
    inv_roots_sh = np.zeros((L, degree), dtype=object)
    n_inv = np.zeros((L, 1), dtype=object)
    n_inv_sh = np.zeros((L, 1), dtype=object)
    n_inv_w = np.zeros((L, 1), dtype=object)
    n_inv_w_sh = np.zeros((L, 1), dtype=object)
    qs = np.zeros((L, 1), dtype=object)
    for row, q in enumerate(moduli):
        r, ir = ntt_root_tables(q, degree)
        roots[row] = r
        inv_roots[row] = ir
        roots_sh[row] = [wordmod.shoup_const(v, q, bits) for v in r]
        inv_roots_sh[row] = [wordmod.shoup_const(v, q, bits) for v in ir]
        ninv = nt.inverse_mod(degree, q)
        # final inverse stage folds n^-1 into x and n^-1 * inv_roots[1] into y
        # (reference inverseDegreeRootOfUnity, PolyRq+Ntt.swift:160-169)
        ninvw = (ninv * ir[1]) % q
        n_inv[row, 0] = ninv
        n_inv_sh[row, 0] = wordmod.shoup_const(ninv, q, bits)
        n_inv_w[row, 0] = ninvw
        n_inv_w_sh[row, 0] = wordmod.shoup_const(ninvw, q, bits)
        qs[row, 0] = q
    return NttTables(
        degree=degree,
        moduli=moduli,
        nlimbs=nlimbs,
        roots=wordmod.pack(roots, nlimbs),
        roots_shoup=wordmod.pack(roots_sh, nlimbs),
        inv_roots=wordmod.pack(inv_roots, nlimbs),
        inv_roots_shoup=wordmod.pack(inv_roots_sh, nlimbs),
        n_inv=wordmod.pack(n_inv, nlimbs),
        n_inv_shoup=wordmod.pack(n_inv_sh, nlimbs),
        n_inv_w=wordmod.pack(n_inv_w, nlimbs),
        n_inv_w_shoup=wordmod.pack(n_inv_w_sh, nlimbs),
        q=wordmod.pack(qs, nlimbs),
        q2=wordmod.pack(qs * 2, nlimbs),
    )


def _lazy_sub_2q(W, x, q2):
    """[0, 4q) -> [0, 2q) via one conditional subtract of 2q."""
    if W is W32:
        (x,), (q2,) = x, q2
        return (wordmod.umin(x, x - q2),)
    from .limb import sub64

    return wordmod._min64(x, sub64(x, q2))


def _wrap_add(W, x, y):
    if W is W32:
        return (x[0] + y[0],)
    from .limb import add64

    return add64(x, y)


def _wrap_sub(W, x, y):
    if W is W32:
        return (x[0] - y[0],)
    from .limb import sub64

    return sub64(x, y)


def fwd_stage(W, x, w, ws, qb, q2b, blocks: int, t: int):
    """One forward butterfly stage over a word of [..., L, chunk] arrays,
    chunk = blocks * 2t. w/ws: per-block roots [L, blocks, 1]; qb/q2b
    [L, 1, 1]. Values enter/leave in [0, 4q) (Harvey lazy)."""
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xv = _wmap(lambda a: a.reshape(batch + (L, blocks, 2, t)), x)
    xx = _wslice(xv, (..., slice(None), 0, slice(None)))
    yy = _wslice(xv, (..., slice(None), 1, slice(None)))
    xx = _lazy_sub_2q(W, xx, q2b)  # [0, 2q)
    tt = W.mul_shoup_lazy(yy, w, ws, qb)  # [0, 2q)
    new_x = _wrap_add(W, xx, tt)  # [0, 4q)
    new_y = _wrap_add(W, _wrap_sub(W, xx, tt), q2b)  # [0, 4q)
    return tuple(
        jnp.stack([nx, ny], axis=-2).reshape(batch + (L, blocks * 2 * t))
        for nx, ny in zip(new_x, new_y)
    )


def fwd_stage_pair(W, x, w1, w1s, w2, w2s, w3, w3s, qb, q2b, m: int, t: int):
    """Two consecutive forward stages fused (radix-4): the [..., L, m, 4, t]
    view computes both butterflies before materializing — half the stage
    relayouts of the radix-2 pipeline (the measured binding constraint: w32
    and w64 run at the same elements*stages/sec despite 4x different op
    counts). Bit-identical values: same twiddles, same lazy ranges
    ([0, 4q) in, [0, 4q) out); mul_shoup_lazy is exact for any input.

    m = first-stage block count, t = quarter length (n >> (log2m + 2));
    w1 [L, m, 1] first-stage roots, w2/w3 [L, m, 1] second-stage roots for
    child blocks 2i / 2i+1."""
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xv = _wmap(lambda a: a.reshape(batch + (L, m, 4, t)), x)
    a = _wslice(xv, (..., slice(None), 0, slice(None)))
    b = _wslice(xv, (..., slice(None), 1, slice(None)))
    c = _wslice(xv, (..., slice(None), 2, slice(None)))
    d = _wslice(xv, (..., slice(None), 3, slice(None)))
    ah = _lazy_sub_2q(W, a, q2b)
    bh = _lazy_sub_2q(W, b, q2b)
    w1c = W.mul_shoup_lazy(c, w1, w1s, qb)
    w1d = W.mul_shoup_lazy(d, w1, w1s, qb)
    A1 = _wrap_add(W, ah, w1c)  # [0, 4q)
    B1 = _wrap_add(W, bh, w1d)
    C1 = _wrap_add(W, _wrap_sub(W, ah, w1c), q2b)
    D1 = _wrap_add(W, _wrap_sub(W, bh, w1d), q2b)
    A1h = _lazy_sub_2q(W, A1, q2b)
    C1h = _lazy_sub_2q(W, C1, q2b)
    w2B = W.mul_shoup_lazy(B1, w2, w2s, qb)
    w3D = W.mul_shoup_lazy(D1, w3, w3s, qb)
    A2 = _wrap_add(W, A1h, w2B)
    B2 = _wrap_add(W, _wrap_sub(W, A1h, w2B), q2b)
    C2 = _wrap_add(W, C1h, w3D)
    D2 = _wrap_add(W, _wrap_sub(W, C1h, w3D), q2b)
    return tuple(
        jnp.stack([qa, qb_, qc, qd], axis=-2).reshape(batch + (L, m * 4 * t))
        for qa, qb_, qc, qd in zip(A2, B2, C2, D2)
    )


def inv_stage_pair(W, x, w1, w1s, w2, w2s, w3, w3s, qb, q2b, m: int, t: int):
    """Two consecutive inverse stages fused (radix-4): first the span-t
    stage (block count 2m, roots w2/w3 for children 2i / 2i+1), then the
    span-2t stage (block count m, root w1). Inputs/outputs in [0, 2q)."""
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xv = _wmap(lambda a: a.reshape(batch + (L, m, 4, t)), x)
    a = _wslice(xv, (..., slice(None), 0, slice(None)))
    b = _wslice(xv, (..., slice(None), 1, slice(None)))
    c = _wslice(xv, (..., slice(None), 2, slice(None)))
    d = _wslice(xv, (..., slice(None), 3, slice(None)))
    A1 = _lazy_sub_2q(W, _wrap_add(W, a, b), q2b)  # [0, 2q)
    B1 = W.mul_shoup_lazy(_wrap_add(W, _wrap_sub(W, a, b), q2b), w2, w2s, qb)
    C1 = _lazy_sub_2q(W, _wrap_add(W, c, d), q2b)
    D1 = W.mul_shoup_lazy(_wrap_add(W, _wrap_sub(W, c, d), q2b), w3, w3s, qb)
    A2 = _lazy_sub_2q(W, _wrap_add(W, A1, C1), q2b)
    C2 = W.mul_shoup_lazy(_wrap_add(W, _wrap_sub(W, A1, C1), q2b), w1, w1s, qb)
    B2 = _lazy_sub_2q(W, _wrap_add(W, B1, D1), q2b)
    D2 = W.mul_shoup_lazy(_wrap_add(W, _wrap_sub(W, B1, D1), q2b), w1, w1s, qb)
    return tuple(
        jnp.stack([qa, qb_, qc, qd], axis=-2).reshape(batch + (L, m * 4 * t))
        for qa, qb_, qc, qd in zip(A2, B2, C2, D2)
    )


def inv_stage(W, x, w, ws, qb, q2b, blocks: int, t: int):
    """One inverse butterfly stage (m > 1) over [..., L, chunk] words."""
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xv = _wmap(lambda a: a.reshape(batch + (L, blocks, 2, t)), x)
    xx = _wslice(xv, (..., slice(None), 0, slice(None)))
    yy = _wslice(xv, (..., slice(None), 1, slice(None)))
    s = _wrap_add(W, xx, yy)  # [0, 4q)
    new_x = _lazy_sub_2q(W, s, q2b)  # [0, 2q)
    d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)  # [0, 4q)
    new_y = W.mul_shoup_lazy(d, w, ws, qb)  # [0, 2q)
    return tuple(
        jnp.stack([nx, ny], axis=-2).reshape(batch + (L, blocks * 2 * t))
        for nx, ny in zip(new_x, new_y)
    )


def inv_final_stage(W, x, nb, nbs, nwb, nwbs, qb, q2b, t: int):
    """Final inverse stage (m=1): folds n^-1 (x half) and n^-1*w^-1 (y half)
    (reference inverseDegreeRootOfUnity, PolyRq+Ntt.swift:160-169,407-430).
    Output fully reduced in [0, q)."""
    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    xv = _wmap(lambda a: a.reshape(batch + (L, 1, 2, t)), x)
    xx = _wslice(xv, (..., slice(None), 0, slice(None)))
    yy = _wslice(xv, (..., slice(None), 1, slice(None)))
    s = _wrap_add(W, xx, yy)  # [0, 4q)
    d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)  # [0, 4q)
    new_x = W.mul_shoup(s, nb, nbs, qb)  # [0, q)
    new_y = W.mul_shoup(d, nwb, nwbs, qb)  # [0, q)
    return tuple(
        jnp.stack([nx, ny], axis=-2).reshape(batch + (L, 2 * t))
        for nx, ny in zip(new_x, new_y)
    )


def _use_radix4(W) -> bool:
    """Radix-4 default for the 2-limb path on accelerator backends only:
    fenced v5e A/B (benchmarks/ntt_radix4_ab.py) measured w64 1.06x
    standalone (1.2x fused into the serving programs), w32 0.99x — and
    XLA:CPU's LLVM backend is superlinear on the doubled per-stage fused
    graphs (the same pathology as the fused u128 MAC), so CPU keeps
    radix-2."""
    import os

    flag = os.environ.get("SHE_TPU_NTT_RADIX4")
    if flag is not None:
        return flag == "1"
    if W is not W64:
        return False
    import jax

    return jax.default_backend() != "cpu"


def forward_ntt_arrays(x, n: int, W, q, q2, roots, roots_sh):
    """Full forward NTT with explicit device table arrays (words of [L, 1]
    scalars and [L, N] roots). Used by forward_ntt and by the limb-sharded
    path (parallel/sharded.py), where the tables are shard_map operands.

    Stages run as fused radix-4 pairs by default (SHE_TPU_NTT_RADIX4=0 for
    the plain radix-2 pipeline): the staged NTT is bound by per-stage
    relayout, not arithmetic (w32 and w64 measure the same
    elements*stages/sec), so halving the stage count is the lever."""
    log2n = nt.log2_exact(n)
    qb = _wmap(lambda a: a[:, :, None], q)  # [L, 1, 1]
    q2b = _wmap(lambda a: a[:, :, None], q2)
    log2m = 0
    radix4 = _use_radix4(W)
    while log2m < log2n:
        m = 1 << log2m
        t = n >> (log2m + 1)
        if radix4 and log2m + 1 < log2n:
            w1 = _wmap(lambda a: a[:, m : 2 * m, None], roots)
            w1s = _wmap(lambda a: a[:, m : 2 * m, None], roots_sh)
            w2 = _wmap(lambda a: a[:, 2 * m : 4 * m : 2, None], roots)
            w2s = _wmap(lambda a: a[:, 2 * m : 4 * m : 2, None], roots_sh)
            w3 = _wmap(lambda a: a[:, 2 * m + 1 : 4 * m : 2, None], roots)
            w3s = _wmap(lambda a: a[:, 2 * m + 1 : 4 * m : 2, None], roots_sh)
            x = fwd_stage_pair(
                W, x, w1, w1s, w2, w2s, w3, w3s, qb, q2b, m, t >> 1
            )
            log2m += 2
        else:
            w = _wmap(lambda a: a[:, m : 2 * m, None], roots)  # [L, m, 1]
            ws = _wmap(lambda a: a[:, m : 2 * m, None], roots_sh)
            x = fwd_stage(W, x, w, ws, qb, q2b, m, t)
            log2m += 1
    return W.reduce_4q(x, q)


def inverse_ntt_arrays(x, n: int, W, q, q2, iroots, iroots_sh, ninv, ninv_sh, ninvw, ninvw_sh):
    """Full inverse NTT with explicit device table arrays. Fused radix-4
    stage pairs by default (see forward_ntt_arrays); the m=1 final stage
    (n^-1 fold) always runs alone."""
    log2n = nt.log2_exact(n)
    qb = _wmap(lambda a: a[:, :, None], q)
    q2b = _wmap(lambda a: a[:, :, None], q2)
    radix4 = _use_radix4(W)
    log2m = log2n - 1
    while log2m >= 0:
        m = 1 << log2m
        t = n >> (log2m + 1)
        if radix4 and log2m >= 2:
            mL = m >> 1
            w1 = _wmap(lambda a: a[:, mL : 2 * mL, None], iroots)
            w1s = _wmap(lambda a: a[:, mL : 2 * mL, None], iroots_sh)
            w2 = _wmap(lambda a: a[:, 2 * mL : 4 * mL : 2, None], iroots)
            w2s = _wmap(lambda a: a[:, 2 * mL : 4 * mL : 2, None], iroots_sh)
            w3 = _wmap(lambda a: a[:, 2 * mL + 1 : 4 * mL : 2, None], iroots)
            w3s = _wmap(lambda a: a[:, 2 * mL + 1 : 4 * mL : 2, None], iroots_sh)
            x = inv_stage_pair(W, x, w1, w1s, w2, w2s, w3, w3s, qb, q2b, mL, t)
            log2m -= 2
        elif m > 1:
            w = _wmap(lambda a: a[:, m : 2 * m, None], iroots)
            ws = _wmap(lambda a: a[:, m : 2 * m, None], iroots_sh)
            x = inv_stage(W, x, w, ws, qb, q2b, m, t)
            log2m -= 1
        else:
            nb = _wmap(lambda a: a[:, :, None], ninv)
            nbs = _wmap(lambda a: a[:, :, None], ninv_sh)
            nwb = _wmap(lambda a: a[:, :, None], ninvw)
            nwbs = _wmap(lambda a: a[:, :, None], ninvw_sh)
            x = inv_final_stage(W, x, nb, nbs, nwb, nwbs, qb, q2b, t)
            log2m -= 1
    return x


def forward_ntt(x, tables: NttTables):
    """x: word of [..., L, N] arrays in [0, q) -> eval form in [0, q)."""
    from . import ntt_mxu, ntt_pallas

    if ntt_mxu.use_mxu(tables):
        return ntt_mxu.forward_ntt(
            x, ntt_mxu.tables_for(tables.moduli, tables.degree, tables.nlimbs)
        )
    if ntt_pallas.use_pallas(tables):
        return ntt_pallas.forward_ntt(x, tables)
    return forward_ntt_arrays(
        x,
        tables.degree,
        tables.word,
        wordmod.as_word(jnp.asarray(tables.q)),
        wordmod.as_word(jnp.asarray(tables.q2)),
        wordmod.as_word(jnp.asarray(tables.roots)),
        wordmod.as_word(jnp.asarray(tables.roots_shoup)),
    )


def inverse_ntt(x, tables: NttTables):
    """x: word of [..., L, N] arrays in [0, q) -> coeff form in [0, q)."""
    from . import ntt_mxu, ntt_pallas

    if ntt_mxu.use_mxu(tables):
        return ntt_mxu.inverse_ntt(
            x, ntt_mxu.tables_for(tables.moduli, tables.degree, tables.nlimbs)
        )
    if ntt_pallas.use_pallas(tables):
        return ntt_pallas.inverse_ntt(x, tables)
    return inverse_ntt_arrays(
        x,
        tables.degree,
        tables.word,
        wordmod.as_word(jnp.asarray(tables.q)),
        wordmod.as_word(jnp.asarray(tables.q2)),
        wordmod.as_word(jnp.asarray(tables.inv_roots)),
        wordmod.as_word(jnp.asarray(tables.inv_roots_shoup)),
        wordmod.as_word(jnp.asarray(tables.n_inv)),
        wordmod.as_word(jnp.asarray(tables.n_inv_shoup)),
        wordmod.as_word(jnp.asarray(tables.n_inv_w)),
        wordmod.as_word(jnp.asarray(tables.n_inv_w_shoup)),
    )

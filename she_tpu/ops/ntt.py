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


def forward_ntt(x, tables: NttTables):
    """x: word of [..., L, N] arrays in [0, q) -> eval form in [0, q)."""
    from . import ntt_pallas

    if ntt_pallas.use_pallas(tables):
        return ntt_pallas.forward_ntt(x, tables)
    W = tables.word
    n = tables.degree
    log2n = nt.log2_exact(n)
    q = wordmod.as_word(jnp.asarray(tables.q))  # [L, 1]
    q2 = wordmod.as_word(jnp.asarray(tables.q2))
    roots = wordmod.as_word(jnp.asarray(tables.roots))
    roots_sh = wordmod.as_word(jnp.asarray(tables.roots_shoup))

    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    for log2m in range(log2n):
        m = 1 << log2m
        t = n >> (log2m + 1)
        xv = _wmap(lambda a: a.reshape(batch + (L, m, 2, t)), x)
        xx = _wslice(xv, (..., slice(None), 0, slice(None)))
        yy = _wslice(xv, (..., slice(None), 1, slice(None)))
        w = _wmap(lambda a: a[:, m : 2 * m, None], roots)  # [L, m, 1]
        ws = _wmap(lambda a: a[:, m : 2 * m, None], roots_sh)
        qb = _wmap(lambda a: a[:, :, None], q)  # [L, 1, 1]
        q2b = _wmap(lambda a: a[:, :, None], q2)
        xx = _lazy_sub_2q(W, xx, q2b)  # [0, 2q)
        tt = W.mul_shoup_lazy(yy, w, ws, qb)  # [0, 2q)
        new_x = _wrap_add(W, xx, tt)  # [0, 4q)
        new_y = _wrap_add(W, _wrap_sub(W, xx, tt), q2b)  # [0, 4q)
        x = tuple(
            jnp.stack([nx, ny], axis=-2).reshape(batch + (L, n))
            for nx, ny in zip(new_x, new_y)
        )
    return W.reduce_4q(x, q)


def inverse_ntt(x, tables: NttTables):
    """x: word of [..., L, N] arrays in [0, q) -> coeff form in [0, q)."""
    from . import ntt_pallas

    if ntt_pallas.use_pallas(tables):
        return ntt_pallas.inverse_ntt(x, tables)
    W = tables.word
    n = tables.degree
    log2n = nt.log2_exact(n)
    q = wordmod.as_word(jnp.asarray(tables.q))
    q2 = wordmod.as_word(jnp.asarray(tables.q2))
    iroots = wordmod.as_word(jnp.asarray(tables.inv_roots))
    iroots_sh = wordmod.as_word(jnp.asarray(tables.inv_roots_shoup))

    batch = x[0].shape[:-2]
    L = x[0].shape[-2]
    for log2m in reversed(range(log2n)):
        m = 1 << log2m
        t = n >> (log2m + 1)
        xv = _wmap(lambda a: a.reshape(batch + (L, m, 2, t)), x)
        xx = _wslice(xv, (..., slice(None), 0, slice(None)))
        yy = _wslice(xv, (..., slice(None), 1, slice(None)))
        qb = _wmap(lambda a: a[:, :, None], q)
        q2b = _wmap(lambda a: a[:, :, None], q2)
        if m > 1:
            w = _wmap(lambda a: a[:, m : 2 * m, None], iroots)
            ws = _wmap(lambda a: a[:, m : 2 * m, None], iroots_sh)
            s = _wrap_add(W, xx, yy)  # [0, 4q)
            new_x = _lazy_sub_2q(W, s, q2b)  # [0, 2q)
            d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)  # [0, 4q)
            new_y = W.mul_shoup_lazy(d, w, ws, qb)  # [0, 2q)
        else:
            ninv = wordmod.as_word(jnp.asarray(tables.n_inv))
            ninv_sh = wordmod.as_word(jnp.asarray(tables.n_inv_shoup))
            ninvw = wordmod.as_word(jnp.asarray(tables.n_inv_w))
            ninvw_sh = wordmod.as_word(jnp.asarray(tables.n_inv_w_shoup))
            nb = _wmap(lambda a: a[:, :, None], ninv)
            nbs = _wmap(lambda a: a[:, :, None], ninv_sh)
            nwb = _wmap(lambda a: a[:, :, None], ninvw)
            nwbs = _wmap(lambda a: a[:, :, None], ninvw_sh)
            s = _wrap_add(W, xx, yy)  # [0, 4q)
            d = _wrap_add(W, _wrap_sub(W, xx, yy), q2b)  # [0, 4q)
            new_x = W.mul_shoup(s, nb, nbs, qb)  # [0, q)
            new_y = W.mul_shoup(d, nwb, nwbs, qb)  # [0, q)
        x = tuple(
            jnp.stack([nx, ny], axis=-2).reshape(batch + (L, n))
            for nx, ny in zip(new_x, new_y)
        )
    return x

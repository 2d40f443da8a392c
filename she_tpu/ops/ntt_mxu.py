"""MXU-matmul NTT: butterfly stage-groups as exact modular matrix products.

The staged NTT (ops/ntt.py, mirroring reference PolyRq+Ntt.swift:237-319) is
VPU/HBM-bound: every stage is an elementwise pass over the whole tensor. On
TPU the FLOPs live in the MXU (the int8/bf16 systolic array), which the
butterfly formulation never touches. This module regroups the SAME stage
matrices into two dense modular matmuls so the MXU does the multiplies:

For N = A*64, view a polynomial as X[a, b] = x[64a + b] (A rows, 64 cols):

* the first log2(A) forward stages have butterfly span >= 64, so they act
  along the row axis with twiddles that depend only on the row index
  (twiddle index i = j >> log2(2t) is a function of a alone when 2t >= 128):
  ONE shared [A, A] matrix ``Lf`` mod q, identical for every column b.
* the last 6 stages act within each 64-row with row-dependent twiddles:
  per-row [64, 64] matrices ``Rf[a]``.

    forward:  X -> Rf[a] @ (Lf @ X)        (phase 1 along rows, 2 within)
    inverse:  X -> Li @ (Ri[a] @ X)        (n^-1 folded into Li)

The matrices are built on host by running the *actual stage butterflies* on
identity matrices, so the composition is bit-identical to the staged path:
same values, same (reference) output ordering.

Matmuls hit the MXU via base-2^7 digit decomposition into int8 dots:
matrix and operand split into D = ceil(bits(q)/7) digits; digit-pair
products accumulate exactly in int32 (bound A * 127^2 * D < 2^31); the
2D-1 shifted partial sums recombine into multi-limb uint32 accumulators and
reduce per RNS row. All arithmetic is exact — no floats.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..utils import nt
from ..utils.refimpl import ntt_root_tables
from . import word as wordmod

_BLOCK = 64  # phase-2 block width (8x128 VPU lane friendly; 64x64 MXU tiles)


# ---------------------------------------------------------------------------
# Host construction: run the staged butterflies on identity matrices
# ---------------------------------------------------------------------------


def _forward_row_matrix(roots, q: int, A: int) -> np.ndarray:
    """Shared [A, A] matrix of the first log2(A) forward stages (acting
    along the row axis of the [A, 64] view). Twiddle index for stage m,
    row block i equals the full-transform index because t_full >= 64."""
    X = np.eye(A, dtype=object)
    log2A = nt.log2_exact(A)
    for log2m in range(log2A):
        m = 1 << log2m
        t = A >> (log2m + 1)  # butterfly span in rows (t_full / 64)
        for i in range(m):
            w = roots[m + i]
            j1 = 2 * i * t
            u = X[j1 : j1 + t].copy()
            v = (X[j1 + t : j1 + 2 * t] * w) % q
            X[j1 : j1 + t] = (u + v) % q
            X[j1 + t : j1 + 2 * t] = (u - v) % q
    return X


def _forward_block_matrices(roots, q: int, A: int, n: int) -> np.ndarray:
    """Per-row [A, 64, 64] matrices of the last 6 forward stages (acting
    within each 64-row; global twiddle block index i = a*bpr + ib)."""
    X = np.zeros((A, _BLOCK, _BLOCK), dtype=object)
    X[:] = np.eye(_BLOCK, dtype=object)
    log2A = nt.log2_exact(A)
    log2n = nt.log2_exact(n)
    for log2m in range(log2A, log2n):
        m = 1 << log2m
        t = n >> (log2m + 1)  # <= 32
        bpr = _BLOCK // (2 * t)  # blocks per 64-row
        for ib in range(bpr):
            w = np.array(
                [roots[m + a * bpr + ib] for a in range(A)], dtype=object
            )[:, None, None]
            j1 = 2 * ib * t
            u = X[:, j1 : j1 + t].copy()
            v = (X[:, j1 + t : j1 + 2 * t] * w) % q
            X[:, j1 : j1 + t] = (u + v) % q
            X[:, j1 + t : j1 + 2 * t] = (u - v) % q
    return X


def _inverse_block_matrices(inv_roots, q: int, A: int, n: int) -> np.ndarray:
    """Per-row [A, 64, 64] matrices of the FIRST inverse stages (t <= 32,
    within each 64-row; inverse butterfly (u+v, (u-v)*w))."""
    X = np.zeros((A, _BLOCK, _BLOCK), dtype=object)
    X[:] = np.eye(_BLOCK, dtype=object)
    log2A = nt.log2_exact(A)
    log2n = nt.log2_exact(n)
    for log2m in reversed(range(log2A, log2n)):
        m = 1 << log2m
        t = n >> (log2m + 1)
        bpr = _BLOCK // (2 * t)
        for ib in range(bpr):
            w = np.array(
                [inv_roots[m + a * bpr + ib] for a in range(A)], dtype=object
            )[:, None, None]
            j1 = 2 * ib * t
            u = X[:, j1 : j1 + t].copy()
            v = X[:, j1 + t : j1 + 2 * t].copy()
            X[:, j1 : j1 + t] = (u + v) % q
            X[:, j1 + t : j1 + 2 * t] = ((u - v) * w) % q
    return X


def _inverse_row_matrix(inv_roots, q: int, A: int, n: int) -> np.ndarray:
    """Shared [A, A] matrix of the LAST inverse stages (span >= 64, along
    rows), with the final n^-1 scaling folded in (the staged path folds it
    into the m=1 stage — same composed values)."""
    X = np.eye(A, dtype=object)
    log2A = nt.log2_exact(A)
    for log2m in reversed(range(log2A)):
        m = 1 << log2m
        t = A >> (log2m + 1)
        for i in range(m):
            w = inv_roots[m + i]
            j1 = 2 * i * t
            u = X[j1 : j1 + t].copy()
            v = X[j1 + t : j1 + 2 * t].copy()
            X[j1 : j1 + t] = (u + v) % q
            X[j1 + t : j1 + 2 * t] = ((u - v) * w) % q
    n_inv = nt.inverse_mod(n, q)
    return (X * n_inv) % q


def _matrix_digits(M: np.ndarray, D: int) -> np.ndarray:
    """Object-int array -> int8 digit array [D, ...] base 2^7."""
    out = np.zeros((D,) + M.shape, dtype=np.int8)
    for d in range(D):
        out[d] = ((M >> (7 * d)) & 0x7F).astype(np.int64).astype(np.int8)
    return out


@dataclass(frozen=True)
class MxuNttTables:
    degree: int
    moduli: tuple
    nlimbs: int
    A: int
    D: int  # digits per value (ceil(max bits(q) / 7))
    Lf: np.ndarray  # int8 [L, D, A, A]
    Rf: np.ndarray  # int8 [L, D, A, 64, 64]
    Ri: np.ndarray  # int8 [L, D, A, 64, 64]
    Li: np.ndarray  # int8 [L, D, A, A]
    # per-row reduction constants (uint32 [L, 1] unless noted)
    q_rows: np.ndarray  # [W, L, 1]
    mu32_rows: np.ndarray
    r32_rows: np.ndarray  # [W, L, 1]: 2^32 mod q as word
    r32_shoup_rows: np.ndarray  # [W, L, 1]
    ks: tuple  # per-row bit length of q (for w64 branchy reduce)


def supports(moduli, degree: int) -> bool:
    # power-of-two required: the stage-matrix construction walks log2 stages
    return (
        nt.is_power_of_two(degree)
        and degree % _BLOCK == 0
        and (degree // _BLOCK) >= 2
    )


def assert_int32_partial_bound(contract: int, digits: int) -> None:
    """The digit-dot einsums accumulate up to `digits` partial products of
    `contract` int8*int8 terms (each <= 127^2) in one int32 accumulator;
    fail loudly instead of wrapping if a shape exceeds the exact bound."""
    if contract * 127 * 127 * digits >= 1 << 31:
        raise OverflowError(
            f"int32 digit-dot bound exceeded: contraction length {contract} x "
            f"127^2 x {digits} digits >= 2^31; use the VPU kernel for this shape"
        )


@lru_cache(maxsize=None)
def build_mxu_tables(moduli: tuple, degree: int, nlimbs: int) -> MxuNttTables:
    assert supports(moduli, degree)
    A = degree // _BLOCK
    L = len(moduli)
    bits = 32 * nlimbs
    D = max(int(q).bit_length() for q in moduli)
    D = -(-D // 7)
    assert_int32_partial_bound(max(A, _BLOCK), D)
    Lf = np.zeros((L, D, A, A), dtype=np.int8)
    Rf = np.zeros((L, D, A, _BLOCK, _BLOCK), dtype=np.int8)
    Ri = np.zeros((L, D, A, _BLOCK, _BLOCK), dtype=np.int8)
    Li = np.zeros((L, D, A, A), dtype=np.int8)
    qr = np.zeros((L, 1), dtype=object)
    mur = np.zeros((L, 1), dtype=object)
    r32r = np.zeros((L, 1), dtype=object)
    r32sr = np.zeros((L, 1), dtype=object)
    ks = []
    for row, q in enumerate(moduli):
        roots, inv_roots = ntt_root_tables(q, degree)
        Lf[row] = _matrix_digits(_forward_row_matrix(roots, q, A), D)
        Rf[row] = _matrix_digits(_forward_block_matrices(roots, q, A, degree), D)
        Ri[row] = _matrix_digits(_inverse_block_matrices(inv_roots, q, A, degree), D)
        Li[row] = _matrix_digits(_inverse_row_matrix(inv_roots, q, A, degree), D)
        qr[row, 0] = q
        mur[row, 0] = (1 << 32) // q
        r32 = (1 << 32) % q
        r32r[row, 0] = r32
        r32sr[row, 0] = wordmod.shoup_const(r32, q, bits)
        ks.append(int(q).bit_length())
    return MxuNttTables(
        degree=degree,
        moduli=tuple(moduli),
        nlimbs=nlimbs,
        A=A,
        D=D,
        Lf=Lf,
        Rf=Rf,
        Ri=Ri,
        Li=Li,
        q_rows=wordmod.pack(qr, nlimbs),
        mu32_rows=wordmod.pack(mur, 1),
        r32_rows=wordmod.pack(r32r, nlimbs),
        r32_shoup_rows=wordmod.pack(r32sr, nlimbs),
        ks=tuple(ks),
    )


# ---------------------------------------------------------------------------
# Runtime kernels
# ---------------------------------------------------------------------------


def _value_digits(w, D: int):
    """Word tuple of uint32 [..., L, A, B] -> list of D int8 digit arrays.
    Digits span limb boundaries for multi-limb words."""
    digs = []
    nl = len(w)
    for d in range(D):
        bit = 7 * d
        li, off = bit // 32, bit % 32
        v = w[li] >> off
        if off > 32 - 7 and li + 1 < nl:
            v = v | (w[li + 1] << (32 - off))
        digs.append((v & 0x7F).astype(jnp.int8))
    return digs


def _accumulate_partials(partials, acc_limbs: int):
    """partials[k]: int32 arrays (nonneg, < 2^31), value = sum_k p_k 2^{7k}
    -> list of acc_limbs uint32 arrays (little-endian limbs). Exact."""
    zeros = jnp.zeros_like(partials[0].view(jnp.int32).astype(jnp.uint32))
    acc = [zeros for _ in range(acc_limbs)]

    def add_at(acc, limb_idx, val):
        if limb_idx >= acc_limbs:
            return acc
        s = acc[limb_idx] + val
        carry = (s < acc[limb_idx]).astype(jnp.uint32)
        acc = list(acc)
        acc[limb_idx] = s
        i = limb_idx + 1
        while i < acc_limbs:
            s2 = acc[i] + carry
            carry = (s2 < acc[i]).astype(jnp.uint32)
            acc[i] = s2
            i += 1
        return acc

    for k, p in enumerate(partials):
        pu = p.astype(jnp.uint32)
        bit = 7 * k
        li, off = bit // 32, bit % 32
        acc = add_at(acc, li, pu << off if off else pu)
        if off:
            acc = add_at(acc, li + 1, pu >> (32 - off))
    return acc


def _reduce_limbs_w32(acc, q, mu32, r32, r32s):
    """Little-endian uint32 limbs -> [0, q) per RNS row (constants [L, 1]).
    Folds limbs top-down with the Shoup-multiplied 2^32 mod q."""
    W32 = wordmod.W32
    out = W32.reduce_u32((acc[-1],), (q,), (mu32,))
    for limb_arr in reversed(acc[:-1]):
        out = W32.mul_shoup(out, (r32,), (r32s,), (q,))
        out = W32.add_mod(out, W32.reduce_u32((limb_arr,), (q,), (mu32,)), (q,))
    return out[0]


def _reduce_limbs_w64_row(acc, q_word, consts):
    """Little-endian uint32 limbs (one RNS row) -> word in [0, q)."""
    W64 = wordmod.W64
    out = W64._reduce_limb(acc[-1], q_word, consts)
    r32, r32s = consts["r32"], consts["r32_shoup"]
    for limb_arr in reversed(acc[:-1]):
        out = W64.mul_shoup(out, r32, r32s, q_word)
        out = W64.add_mod(out, W64._reduce_limb(limb_arr, q_word, consts), q_word)
    return out


def _acc_limbs_for(bound_bits: int) -> int:
    return -(-bound_bits // 32)


def _phase_row(x, M_digits, t: "MxuNttTables", contract_rows: int):
    """Shared along-row matmul: x word of [..., L, A, B]; M_digits int8
    [L, D, A', A]. Returns word of [..., L, A', B] reduced mod q per row."""
    D = t.D
    xd = _value_digits(x, D)
    md = jnp.asarray(M_digits)
    partials = {}
    for i in range(D):
        for j in range(D):
            p = jnp.einsum(
                "lua,...lab->...lub",
                md[:, i],
                xd[j],
                preferred_element_type=jnp.int32,
            )
            k = i + j
            partials[k] = p if k not in partials else partials[k] + p
    return _finish(partials, t, contract_rows)


def _phase_block(x, M_digits, t: "MxuNttTables"):
    """Per-row within-block matmul: x word of [..., L, A, B]; M_digits int8
    [L, D, A, B, B]. Returns word of [..., L, A, B] reduced mod q."""
    D = t.D
    xd = _value_digits(x, D)
    md = jnp.asarray(M_digits)
    partials = {}
    for i in range(D):
        for j in range(D):
            p = jnp.einsum(
                "laub,...lab->...lau",
                md[:, i],
                xd[j],
                preferred_element_type=jnp.int32,
            )
            k = i + j
            partials[k] = p if k not in partials else partials[k] + p
    return _finish(partials, t, _BLOCK)


def _finish(partials, t: "MxuNttTables", contract: int):
    qmax = max(t.moduli)
    bound_bits = (contract * (qmax - 1) * (qmax - 1)).bit_length()
    acc = _accumulate_partials(
        [partials[k] for k in sorted(partials)], _acc_limbs_for(bound_bits)
    )
    if t.nlimbs == 1:
        # consts broadcast as [L, 1, 1] against the [..., L, A, B] view
        q = jnp.asarray(t.q_rows[0])[:, :, None]
        mu32 = jnp.asarray(t.mu32_rows[0])[:, :, None]
        r32 = jnp.asarray(t.r32_rows[0])[:, :, None]
        r32s = jnp.asarray(t.r32_shoup_rows[0])[:, :, None]
        return (_reduce_limbs_w32(acc, q, mu32, r32, r32s),)
    # w64: per-row reduce (bit-length branches are per-row Python)
    L = len(t.moduli)
    los, his = [], []
    for row in range(L):
        qw = tuple(jnp.asarray(t.q_rows[l, row]) for l in range(2))
        consts = {
            "k": t.ks[row],
            "mu32": np.uint32(int(t.mu32_rows[0, row, 0])),
            "r32": tuple(jnp.asarray(t.r32_rows[l, row]) for l in range(2)),
            "r32_shoup": tuple(
                jnp.asarray(t.r32_shoup_rows[l, row]) for l in range(2)
            ),
        }
        racc = [a[..., row, :, :] for a in acc]
        lo, hi = _reduce_limbs_w64_row(racc, qw, consts)
        los.append(lo)
        his.append(hi)
    return (jnp.stack(los, axis=-3), jnp.stack(his, axis=-3))


def forward_ntt(x, t: "MxuNttTables"):
    """x: word of [..., L, N] in [0, q) -> eval form in [0, q); bit-identical
    to ops.ntt.forward_ntt (same stage composition)."""
    shape = x[0].shape
    A = t.A
    xr = tuple(a.reshape(shape[:-1] + (A, _BLOCK)) for a in x)
    y = _phase_row(xr, t.Lf, t, A)
    z = _phase_block(y, t.Rf, t)
    return tuple(a.reshape(shape) for a in z)


def inverse_ntt(x, t: "MxuNttTables"):
    """x: word of [..., L, N] eval form in [0, q) -> coeff form in [0, q)."""
    shape = x[0].shape
    A = t.A
    xr = tuple(a.reshape(shape[:-1] + (A, _BLOCK)) for a in x)
    y = _phase_block(xr, t.Ri, t)
    z = _phase_row(y, t.Li, t, A)
    return tuple(a.reshape(shape) for a in z)


def use_mxu(tables) -> bool:
    """Dispatch policy for ops.ntt: opt-in via SHE_TPU_NTT_MXU=1.

    Fenced v5e measurements (benchmarks/ntt_mxu_bench.py, scan-chained,
    host-fetch fenced): the staged VPU path wins as the NTT kernel —
    w32 N=4096x3 batch 64: staged 34.0k vs mxu 25.0k transforms/s;
    w64 N=8192x3: staged 21.7k vs 15.8k (the D=8 digit recombination is
    VPU-bound). End-to-end PIR serving with SHE_TPU_NTT_MXU=1 measured
    59 vs 177 q/s. The same digit-matmul decomposition DOES win where the
    contraction is long and the operand is static — the dim-0 database MAC
    (pir/serving.py:dim0_inner_products_mxu, 3.4x end-to-end) — so the MXU
    experiment's outcome is: matmul-ify the MACs, keep butterflies on the
    VPU."""
    flag = os.environ.get("SHE_TPU_NTT_MXU")
    if flag == "0":
        return False
    if not supports(tables.moduli, tables.degree):
        return False
    if flag == "1":
        return True
    return False


@lru_cache(maxsize=None)
def tables_for(moduli: tuple, degree: int, nlimbs: int) -> MxuNttTables:
    return build_mxu_tables(moduli, degree, nlimbs)

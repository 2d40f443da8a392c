"""BFV scheme: contexts, keys, encode/encrypt/decrypt, ciphertext ops.

TPU-native re-design of the reference's Bfv<T> (Sources/HomomorphicEncryption/
Bfv/*.swift) over uint32 limb tensors. Host side: parameter/table
precomputation, AES-CTR-DRBG sampling (bit-exact byte streams for seeded
ciphertext interop). Device side: NTTs, modular MACs, scaling — all
jax ops jit-compiled per (params, op) specialization.

Canonical ciphertext format is Coeff, fresh ciphertexts have 2 polys, and
the last coefficient modulus is reserved for key switching, as in the
reference (Bfv.swift:31-41).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .. import errors
from ..core import poly as polymod
from ..core import rns as rnsmod
from ..core.context import PolyContext, get_poly_context
from ..core.poly import COEFF, EVAL, PolyRq
from ..ops import limb
from ..ops import word as wordmod
from ..params import EncryptionParameters
from ..rng import sampling
from ..rng.ctr_drbg import BufferedRng, SystemRng, nist_aes128_ctr
from ..utils import nt

SEED_BYTES = 32
FRESH_CIPHERTEXT_POLY_COUNT = 2
MIN_NOISE_BUDGET = 0.0


@lru_cache(maxsize=None)
def get_bfv_context(params: EncryptionParameters) -> "BfvContext":
    return BfvContext(params)


class BfvContext:
    """Per-parameter precomputation (reference Context.swift:94-143)."""

    def __init__(self, params: EncryptionParameters):
        self.params = params
        bits = params.scalar_bits
        degree = params.poly_degree
        all_moduli = params.coefficient_moduli
        self.secret_key_context = get_poly_context(degree, all_moduli, bits)
        ct_moduli = all_moduli[:-1] if len(all_moduli) > 1 else all_moduli
        self.ciphertext_context = get_poly_context(degree, ct_moduli, bits)
        self.key_switch_modulus = all_moduli[-1] if len(all_moduli) > 1 else None
        self.plaintext_context = get_poly_context(
            degree, (params.plaintext_modulus,), bits
        )
        if self.key_switch_modulus is not None:
            self.key_switching_contexts = [
                get_poly_context(
                    degree, ct_moduli[: i + 1] + (self.key_switch_modulus,), bits
                )
                for i in range(len(ct_moduli))
            ]
        else:
            self.key_switching_contexts = []
        self.simd_matrix = self._generate_encoding_matrix()
        self._bsk_pool = rnsmod.bsk_prime_pool(degree, len(ct_moduli), bits)
        self._rns_tools: dict[int, rnsmod.RnsTool] = {}

    @property
    def degree(self) -> int:
        return self.params.poly_degree

    @property
    def plaintext_modulus(self) -> int:
        return self.params.plaintext_modulus

    @property
    def supports_simd_encoding(self) -> bool:
        return self.simd_matrix is not None

    @property
    def supports_evaluation_key(self) -> bool:
        return self.params.supports_evaluation_key

    def get_rns_tool(self, moduli_count: int) -> rnsmod.RnsTool:
        if moduli_count not in self._rns_tools:
            ctx = self.ciphertext_context.get_context(moduli_count)
            self._rns_tools[moduli_count] = rnsmod.RnsTool(
                ctx, self.plaintext_modulus, self._bsk_pool
            )
        return self._rns_tools[moduli_count]

    def _generate_encoding_matrix(self):
        """SIMD index matrix from powers of g=3, bit-reversed
        (reference Encoding.swift:197-219)."""
        t = self.params.plaintext_modulus
        n = self.params.poly_degree
        if not nt.is_ntt_modulus(t, n):
            return None
        log2n = nt.log2_exact(n)
        row_size = n >> 1
        mask = (n << 1) - 1
        idx = np.zeros(n, dtype=np.int64)
        g_pow = 1
        for i in range(row_size):
            index1 = (g_pow - 1) >> 1
            index2 = (mask - g_pow) >> 1
            idx[i] = nt.reverse_bits(index1, log2n)
            idx[row_size | i] = nt.reverse_bits(index2, log2n)
            g_pow = (g_pow * 3) & mask
        return idx

    def simd_dimensions(self):
        if not self.supports_simd_encoding:
            return None
        return (2, self.degree // 2)


# ---------------------------------------------------------------------------
# Keys / plaintext / ciphertext containers
# ---------------------------------------------------------------------------


# Donated jit: jax sets up XLA input-output aliasing when the donated input
# matches the output shape/dtype, so the zero output is written into the
# SAME HBM allocation as the key material — a device-side scrub-then-free
# (the device analogue of CUtil/zeroize.c's barrier memset).
_device_scrub = jax.jit(lambda x: jnp.zeros_like(x), donate_argnums=0)


@dataclass
class SecretKey:
    """Ternary secret stored in Eval over the secret-key context
    (reference Bfv+Keys.swift:20-26).

    Lifecycle: the reference zeroizes key material on deinit
    (Keys.swift:19-50, Zeroization.swift:1-40). Here `zeroize()` scrubs
    host numpy buffers in place, and scrubs-then-frees device (jax)
    buffers: a donated jit overwrites the HBM allocation with zeros
    (input-output aliasing makes XLA write the zero output into the
    donated input buffer) before the handle is deleted; any use after
    that raises. Also usable as a context manager
    (`with generate_secret_key(ctx) as sk: ...`), and zeroized as a
    best-effort fallback when garbage-collected."""

    poly: PolyRq  # eval, [W, L_all, N]

    def zeroize(self) -> None:
        data = self.poly.data
        if isinstance(data, np.ndarray):
            if data.flags.writeable and data.dtype != object:
                from ..utils.zeroize import zeroize as _z

                _z(np.ascontiguousarray(data) if not data.flags.c_contiguous else data)
        else:
            try:
                # On TPU/GPU the donated jit writes zeros over the HBM
                # allocation (input-output aliasing); XLA:CPU ignores
                # donation, where the explicit delete below frees the copy.
                scrubbed = _device_scrub(data)
                scrubbed.block_until_ready()
                scrubbed.delete()
            except Exception:
                pass
            try:
                data.delete()
            except Exception:
                pass

    def __enter__(self) -> "SecretKey":
        return self

    def __exit__(self, *exc) -> bool:
        self.zeroize()
        return False

    def __del__(self):  # best-effort deinit scrub, as in the reference
        try:
            self.zeroize()
        except Exception:
            pass


@dataclass
class Plaintext:
    context: BfvContext
    poly: PolyRq  # coeff over plaintext context, or eval over a ct context

    @property
    def fmt(self) -> str:
        return self.poly.fmt


@dataclass
class Ciphertext:
    context: BfvContext
    polys: list[PolyRq]
    correction_factor: int = 1
    seed: bytes | None = None

    def tree_flatten(self):
        return (self.polys,), (self.context, self.correction_factor, self.seed)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1], aux[2]) if False else cls(
            context=aux[0], polys=children[0], correction_factor=aux[1], seed=aux[2]
        )

    @property
    def fmt(self) -> str:
        return self.polys[0].fmt

    @property
    def moduli_count(self) -> int:
        return len(self.polys[0].moduli)

    def poly_context(self) -> PolyContext:
        return self.polys[0].context

    # operator ergonomics (reference Ciphertext.swift:115-500)
    def __add__(self, other):
        if isinstance(other, Plaintext):
            return ct_add_pt(self, other)
        return ct_add(self, other)

    def __sub__(self, other):
        if isinstance(other, Plaintext):
            return ct_sub_pt(self, other)
        return ct_sub(self, other)

    def __neg__(self):
        return ct_neg(self)

    def __mul__(self, other):
        if isinstance(other, Plaintext):
            return ct_mul_pt(self, other)
        return ct_mul(self, other)

    def decrypt(self, secret_key):
        return decrypt(self, secret_key)

    def noise_budget(self, secret_key):
        return noise_budget(self, secret_key)


import jax as _jax

_jax.tree_util.register_pytree_node(
    Ciphertext, Ciphertext.tree_flatten, Ciphertext.tree_unflatten
)
_jax.tree_util.register_pytree_node(
    Plaintext,
    lambda p: ((p.poly,), (p.context,)),
    lambda aux, ch: Plaintext(aux[0], ch[0]),
)


# ---------------------------------------------------------------------------
# Key generation
# ---------------------------------------------------------------------------


def generate_secret_key(context: BfvContext, rng=None) -> SecretKey:
    """Ternary secret sampled in Coeff, stored in Eval
    (reference Bfv+Keys.swift:20-26)."""
    rng = rng or SystemRng()
    ctx = context.secret_key_context
    vals = sampling.sample_ternary(rng, list(ctx.moduli), ctx.degree)
    sk_coeff = PolyRq.from_values(vals, ctx, COEFF)
    return SecretKey(polymod.forward_ntt(sk_coeff))


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


def encode(context: BfvContext, values, fmt: str = "coefficient") -> Plaintext:
    """Unsigned values in [0, t) -> Coeff plaintext
    (reference Encoding.swift:160-234)."""
    t = context.plaintext_modulus
    n = context.degree
    values = list(values)
    if len(values) > n:
        raise errors.EncodingError(f"{len(values)} values > degree {n}")
    for v in values:
        if not 0 <= v < t:
            raise errors.EncodingError(f"value {v} out of range [0, {t})")
    if fmt == "coefficient":
        row = np.zeros((1, n), dtype=object)
        row[0, : len(values)] = values
        return Plaintext(context, PolyRq.from_values(row, context.plaintext_context, COEFF))
    if fmt == "simd":
        if not context.supports_simd_encoding:
            raise errors.SimdEncodingNotSupported(str(context.params))
        row = np.zeros((1, n), dtype=object)
        row[0, context.simd_matrix[: len(values)]] = values
        ev = PolyRq.from_values(row, context.plaintext_context, EVAL)
        return Plaintext(context, polymod.inverse_ntt(ev))
    raise errors.EncodingError(f"unknown format {fmt}")


def encode_signed(context: BfvContext, values, fmt: str = "coefficient") -> Plaintext:
    t = context.plaintext_modulus
    lo, hi = -(t >> 1), (t - 1) >> 1
    centered = []
    for v in values:
        if not lo <= v <= hi:
            raise errors.EncodingError(f"signed value {v} out of [{lo}, {hi}]")
        centered.append(v % t)
    return encode(context, centered, fmt)


def decode(context: BfvContext, plaintext: Plaintext, fmt: str = "coefficient") -> list[int]:
    pt = plaintext
    if pt.poly.fmt == EVAL or pt.poly.context is not context.plaintext_context:
        pt = plaintext_to_coeff(plaintext)
    vals = pt.poly.to_values()[0]
    if fmt == "coefficient":
        return [int(v) for v in vals]
    if fmt == "simd":
        if not context.supports_simd_encoding:
            raise errors.SimdEncodingNotSupported(str(context.params))
        ev = polymod.forward_ntt(pt.poly)
        evv = ev.to_values()[0]
        return [int(evv[i]) for i in context.simd_matrix]
    raise errors.EncodingError(f"unknown format {fmt}")


def decode_signed(context: BfvContext, plaintext: Plaintext, fmt: str = "coefficient") -> list[int]:
    t = context.plaintext_modulus
    return [v - t if v > (t - 1) >> 1 else v for v in decode(context, plaintext, fmt)]


def plaintext_to_eval(
    context: BfvContext, plaintext: Plaintext, moduli_count: int | None = None
) -> Plaintext:
    """Coeff (mod t) -> Eval (mod q_0..q_{c-1}) via centered lift + NTT
    (reference Plaintext.convertToEvalFormat, Plaintext.swift:149-171)."""
    if plaintext.poly.fmt == EVAL:
        return plaintext
    c = moduli_count or len(context.ciphertext_context.moduli)
    poly_ctx = context.ciphertext_context.get_context(c)
    t = context.plaintext_modulus
    t_threshold = (t + 1) // 2
    src = plaintext.poly.word()
    W = poly_ctx.word
    rows = []
    for i, qi in enumerate(poly_ctx.moduli):
        inc = poly_ctx.scalar_word(qi - t)
        if poly_ctx.nlimbs == 1:
            cond = src[0][0] < np.uint32(t_threshold)
            lifted = (jnp.where(cond, src[0][0], src[0][0] + inc[0]),)
        else:
            s = (src[0][0], src[1][0])
            cond = limb.lt64(s, poly_ctx.scalar_word(t_threshold))
            added = limb.add64(s, inc)
            lifted = tuple(jnp.where(cond, a, b) for a, b in zip(s, added))
        rows.append(lifted)
    lifted_poly = PolyRq.from_word(polymod._stack_rows(rows), poly_ctx, COEFF)
    return Plaintext(context, polymod.forward_ntt(lifted_poly))


_BATCH_NTT_BLOCK = 128
_batch_ntt_jit_cache: dict = {}


def _blocked_forward_ntt(poly_ctx, w):
    """Forward-NTT [W, B, L, N] word tuples through ONE jitted program that
    lax.maps over fixed-size blocks of rows. Eagerly dispatching the staged
    NTT compiles hundreds of per-stage kernels (~2 min for a 1M-entry PIR
    database); here XLA compiles a single block body once (and the
    persistent compilation cache makes repeat process runs free)."""
    import jax

    from ..ops import ntt as nttmod

    B = w[0].shape[0]
    tables = poly_ctx.ntt_tables
    if B <= _BATCH_NTT_BLOCK:
        key = (tables.moduli, tables.degree, tables.nlimbs, B, "direct")
        fn = _batch_ntt_jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda x: nttmod.forward_ntt(x, tables))
            _batch_ntt_jit_cache[key] = fn
        return fn(w)
    pad = (-B) % _BATCH_NTT_BLOCK
    if pad:
        w = tuple(jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in w)
    nblocks = (B + pad) // _BATCH_NTT_BLOCK
    key = (tables.moduli, tables.degree, tables.nlimbs, nblocks, "map")
    fn = _batch_ntt_jit_cache.get(key)
    if fn is None:

        def run(x):
            blocked = tuple(
                a.reshape((nblocks, _BATCH_NTT_BLOCK) + a.shape[1:]) for a in x
            )
            out = jax.lax.map(lambda blk: nttmod.forward_ntt(blk, tables), blocked)
            return tuple(a.reshape((nblocks * _BATCH_NTT_BLOCK,) + a.shape[2:]) for a in out)

        fn = jax.jit(run)
        _batch_ntt_jit_cache[key] = fn
    out = fn(w)
    if pad:
        out = tuple(a[:B] for a in out)
    return out


def batch_encode_to_eval(context: BfvContext, coeff_rows: np.ndarray, moduli_count: int | None = None) -> list:
    """Batch-encode many coefficient-format plaintexts (object array [B, N]
    of values mod t) into Eval plaintexts with ONE batched NTT — the TPU-fast
    path for PIR/PNNS database processing."""
    c = moduli_count or len(context.ciphertext_context.moduli)
    poly_ctx = context.ciphertext_context.get_context(c)
    t = context.plaintext_modulus
    t_threshold = (t + 1) // 2
    B = coeff_rows.shape[0]
    L = len(poly_ctx.moduli)
    # centered lift in uint64 (t < q_i < 2^62, so every value fits):
    # object-dtype where/add was the remaining host hotspot of DB processing
    rows64 = np.asarray(coeff_rows, dtype=object).astype(np.uint64)
    small = rows64 < np.uint64(t_threshold)
    lifted = np.zeros((B, L, poly_ctx.degree), dtype=np.uint64)
    for i, qi in enumerate(poly_ctx.moduli):
        lifted[:, i, :] = np.where(small, rows64, rows64 + np.uint64(qi - t))
    packed = np.zeros((poly_ctx.nlimbs, B, L, poly_ctx.degree), dtype=np.uint32)
    for w in range(poly_ctx.nlimbs):
        packed[w] = ((lifted >> np.uint64(32 * w)) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    w = tuple(jnp.asarray(packed[i]) for i in range(poly_ctx.nlimbs))
    ev = _blocked_forward_ntt(poly_ctx, w)
    stacked = jnp.stack(ev)  # [W, B, L, N]
    out = []
    for b in range(B):
        out.append(Plaintext(context, PolyRq(stacked[:, b], poly_ctx, EVAL)))
    return out


def plaintext_to_coeff(plaintext: Plaintext) -> Plaintext:
    """Eval (mod q) -> Coeff (mod t) (reference Plaintext.swift:176-196)."""
    if plaintext.poly.fmt == COEFF and len(plaintext.poly.moduli) == 1:
        ctx0 = plaintext.poly.context
        if ctx0.moduli[0] == plaintext.context.plaintext_modulus:
            return plaintext
    context = plaintext.context
    t = context.plaintext_modulus
    t_threshold = (t + 1) // 2
    coeff = polymod.inverse_ntt(plaintext.poly)
    q0 = coeff.context.moduli[0]
    inc = q0 - t
    w = coeff.word()
    pctx = context.plaintext_context
    if coeff.context.nlimbs == 1:
        row = w[0][0]
        cond = row >= np.uint32(t_threshold)
        out = (jnp.where(cond, row - np.uint32(inc), row)[None],)
    else:
        s = (w[0][0], w[1][0])
        cond = ~limb.lt64(s, pctx.scalar_word(t_threshold))
        subbed = limb.sub64(s, pctx.scalar_word(inc))
        out = tuple(jnp.where(cond, a, b)[None] for a, b in zip(subbed, s))
    return Plaintext(context, PolyRq.from_word(out, pctx, COEFF))


# ---------------------------------------------------------------------------
# Encryption
# ---------------------------------------------------------------------------


def encrypt_zero(
    context: BfvContext,
    secret_key: SecretKey,
    seed: bytes | None = None,
    err_rng=None,
    poly_context: PolyContext | None = None,
) -> Ciphertext:
    """c = (-(a*s + e), a) with `a` expanded from a retained seed
    (reference Bfv+Encrypt.swift:150-181)."""
    ct_ctx = poly_context or context.ciphertext_context
    seed = seed if seed is not None else os.urandom(SEED_BYTES)
    a_rng = nist_aes128_ctr(seed)
    a_vals = sampling.sample_uniform(a_rng, list(ct_ctx.moduli), ct_ctx.degree)
    a = PolyRq.from_values(a_vals, ct_ctx, EVAL)

    err_rng = err_rng or SystemRng()
    e_vals = sampling.sample_centered_binomial(
        err_rng, list(ct_ctx.moduli), ct_ctx.degree, context.params.error_std_dev.value
    )
    e = PolyRq.from_values(e_vals, ct_ctx, COEFF)

    a_s = polymod.mul_poly_rows(a, secret_key.poly.word(), ct_ctx)
    c0 = polymod.add(polymod.inverse_ntt(a_s), e)
    c0 = polymod.neg(c0)
    a_coeff = polymod.inverse_ntt(a)
    return Ciphertext(context, [c0, a_coeff], correction_factor=1, seed=seed)


def _plaintext_translate(ct: Ciphertext, pt: Plaintext, subtract: bool) -> Ciphertext:
    """c0 +-= round(Q/t * m): Delta-scaling with rounding correction
    (reference Bfv+Encrypt.swift:75-139)."""
    if ct.correction_factor != 1:
        raise errors.InvalidCorrectionFactor(str(ct.correction_factor))
    if ct.fmt != COEFF or pt.poly.fmt != COEFF:
        raise errors.InvalidFormat("plaintext translate requires Coeff")
    context = ct.context
    tool = context.get_rns_tool(ct.moduli_count)
    ct_ctx = ct.polys[0].context
    W = ct_ctx.word
    t = context.plaintext_modulus
    pctx = context.plaintext_context
    t_rc = pctx.row_consts[0]
    m = pt.poly.word()

    # adjust = floor((qModT * m + tThreshold) / t)
    q_mod_t = tool.q_mod_t % t
    if ct_ctx.nlimbs == 1:
        prod_lo, prod_hi = limb.mul32(m[0][0], np.uint32(q_mod_t))
        s, c = limb.addc32(prod_lo, np.uint32(tool.t_threshold))
        adjust, _ = wordmod.W32.div_floor(
            s, prod_hi + c, pctx.row_word("q", 0), t_rc["k"], pctx.row_word("mu", 0)
        )
    else:
        mw = (m[0][0], m[1][0])
        p = limb.mul64(mw, pctx.scalar_word(q_mod_t))
        thr = pctx.scalar_word(tool.t_threshold)
        p = limb.add128(p, (thr[0], thr[1], jnp.zeros_like(p[0]), jnp.zeros_like(p[0])))
        adjust, _ = wordmod.W64.div_floor(
            p, pctx.row_word("q", 0), t_rc["k"], pctx.row_word("mu", 0)
        )

    c0w = ct.polys[0].word()
    rows = []
    for i, qi in enumerate(ct_ctx.moduli):
        qw = ct_ctx.row_word("q", i)
        delta = tool.q_div_t[i]
        dw = ct_ctx.scalar_word(delta)
        dws = ct_ctx.scalar_word(wordmod.shoup_const(delta, qi, ct_ctx.scalar_bits))
        if ct_ctx.nlimbs == 1:
            mrow = (m[0][0],)
            adj = adjust
        else:
            mrow = (m[0][0], m[1][0])
            adj = adjust
        plain_delta = W.mul_shoup(mrow, dw, dws, qw)
        # adjust < t < q_i, m values < t < q_i: valid addMod inputs
        total = W.add_mod(plain_delta, adj, qw)
        if subtract:
            rows.append(W.sub_mod(polymod._row(c0w, i), total, qw))
        else:
            rows.append(W.add_mod(polymod._row(c0w, i), total, qw))
    new_c0 = PolyRq.from_word(polymod._stack_rows(rows), ct_ctx, COEFF)
    return Ciphertext(context, [new_c0] + ct.polys[1:], ct.correction_factor, None)


def encrypt(pt: Plaintext, secret_key: SecretKey, seed: bytes | None = None, err_rng=None) -> Ciphertext:
    ct = encrypt_zero(pt.context, secret_key, seed=seed, err_rng=err_rng)
    out = _plaintext_translate(ct, pt, subtract=False)
    out.seed = ct.seed
    return out


# ---------------------------------------------------------------------------
# Decryption / noise budget
# ---------------------------------------------------------------------------


def _dot_product_with_key(ct: Ciphertext, secret_key: SecretKey) -> PolyRq:
    """sum_i c_i * s^i in Eval, then inverse NTT
    (reference Bfv+Decrypt.swift:188-204)."""
    polys = ct.polys
    ct_ctx = polys[0].context
    L = len(ct_ctx.moduli)
    if ct.fmt == COEFF:
        polys = [polymod.forward_ntt(p) for p in polys]
    sk = PolyRq(secret_key.poly.data[:, :L, :], ct_ctx, EVAL)
    acc = polys[0]
    sk_power = sk
    for idx, ci in enumerate(polys[1:]):
        acc = polymod.add(acc, polymod.mul_eval(ci, sk_power))
        if idx != len(polys) - 2:
            sk_power = polymod.mul_eval(sk_power, sk)
    return polymod.inverse_ntt(acc)


def decrypt(ct: Ciphertext, secret_key: SecretKey) -> Plaintext:
    context = ct.context
    t = context.plaintext_modulus
    dot = _dot_product_with_key(ct, secret_key)
    scaling = nt.inverse_mod(ct.correction_factor % t, t)
    tool = context.get_rns_tool(len(dot.moduli))
    out = tool.scale_and_round(dot.word(), scaling)
    return Plaintext(context, PolyRq.from_word(out, context.plaintext_context, COEFF))


def noise_budget(ct: Ciphertext, secret_key: SecretKey) -> float:
    """log2(Q / (2 |v*t|_inf)); host CRT composition
    (reference Bfv+Decrypt.swift:116-174). Secret-leaking diagnostic."""
    import math

    dot = _dot_product_with_key(ct, secret_key)
    vt = polymod.mul_scalar_rows(dot, [ct.context.plaintext_modulus] * len(dot.moduli))
    tool = ct.context.get_rns_tool(len(dot.moduli))
    composed = tool.crt_compose(vt.to_values())
    Q = dot.context.q_product
    q_div_2 = (Q + 1) >> 1
    norm = max((Q - int(c) if int(c) > q_div_2 else int(c)) for c in composed)
    if norm == 0:
        return float("inf")
    return math.log2(Q / (2 * norm))


# ---------------------------------------------------------------------------
# Ciphertext ops
# ---------------------------------------------------------------------------


def _check_ct_compat(a: Ciphertext, b: Ciphertext):
    if a.context is not b.context:
        raise errors.IncompatibleContexts("different BFV contexts")
    if a.correction_factor != b.correction_factor:
        raise errors.InvalidCorrectionFactor(
            f"{a.correction_factor} vs {b.correction_factor}"
        )
    if len(a.polys) != len(b.polys):
        raise errors.InvalidCiphertext("different poly counts")


def ct_add(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_ct_compat(a, b)
    return Ciphertext(
        a.context,
        [polymod.add(x, y) for x, y in zip(a.polys, b.polys)],
        a.correction_factor,
    )


def ct_sub(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    _check_ct_compat(a, b)
    return Ciphertext(
        a.context,
        [polymod.sub(x, y) for x, y in zip(a.polys, b.polys)],
        a.correction_factor,
    )


def ct_neg(a: Ciphertext) -> Ciphertext:
    return Ciphertext(a.context, [polymod.neg(p) for p in a.polys], a.correction_factor)


def ct_add_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    return _plaintext_translate(a, pt, subtract=False)


def ct_sub_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    return _plaintext_translate(a, pt, subtract=True)


def ct_mul_pt(a: Ciphertext, pt: Plaintext) -> Ciphertext:
    """Eval ciphertext x Eval plaintext, pointwise
    (reference Bfv.swift mulAssign(_:_:EvalPlaintext))."""
    if a.fmt != EVAL or pt.poly.fmt != EVAL:
        raise errors.InvalidFormat("ct*pt requires Eval formats")
    if pt.poly.context is not a.polys[0].context:
        raise errors.IncompatibleContexts("plaintext context mismatch")
    return Ciphertext(
        a.context,
        [polymod.mul_eval(p, pt.poly) for p in a.polys],
        a.correction_factor,
    )


def ct_to_eval(a: Ciphertext) -> Ciphertext:
    if a.fmt == EVAL:
        return a
    return Ciphertext(
        a.context, [polymod.forward_ntt(p) for p in a.polys], a.correction_factor, a.seed
    )


def ct_to_coeff(a: Ciphertext) -> Ciphertext:
    if a.fmt == COEFF:
        return a
    return Ciphertext(
        a.context, [polymod.inverse_ntt(p) for p in a.polys], a.correction_factor, a.seed
    )


def mod_switch_down(a: Ciphertext) -> Ciphertext:
    """Drop the last ciphertext modulus (reference Bfv.swift:163-171)."""
    if a.fmt != COEFF:
        raise errors.InvalidFormat("modSwitchDown requires Coeff")
    if a.moduli_count < 2:
        raise errors.InvalidCiphertext("cannot drop below one modulus")
    return Ciphertext(
        a.context,
        [polymod.divide_and_round_q_last(p) for p in a.polys],
        a.correction_factor,
    )


def mod_switch_down_to_single(a: Ciphertext) -> Ciphertext:
    while a.moduli_count > 1:
        a = mod_switch_down(a)
    return a


def is_transparent(a: Ciphertext) -> bool:
    """All polys except the first are zero (reference Bfv+Encrypt.swift:48-62)."""
    return all(p.is_zero() for p in a.polys[1:])


# ---------------------------------------------------------------------------
# Ciphertext-ciphertext multiply (BEHZ, eprint 2016/510)
# ---------------------------------------------------------------------------


def _compute_behz_polys(ct: Ciphertext) -> list[PolyRq]:
    """Lift each poly to [q, B_sk] and NTT (reference Bfv+Multiply.swift:51-57)."""
    tool = ct.context.get_rns_tool(ct.moduli_count)
    out = []
    for p in ct.polys:
        lifted = tool.lift_q_to_qbsk(p.word())
        lifted_poly = PolyRq.from_word(lifted, tool.q_bsk_context, COEFF)
        out.append(polymod.forward_ntt(lifted_poly))
    return out


def multiply_without_scaling(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Tensor product in the extended base (Bfv+Multiply.swift:63-85)."""
    if a.context is not b.context:
        raise errors.IncompatibleContexts("different contexts")
    if len(a.polys) != 2 or len(b.polys) != 2:
        raise errors.InvalidCiphertext("multiply requires 2-poly ciphertexts")
    if a.correction_factor != 1 or b.correction_factor != 1:
        raise errors.InvalidCorrectionFactor("multiply requires correction factor 1")
    if a.fmt != COEFF or b.fmt != COEFF:
        raise errors.InvalidFormat("multiply requires canonical (Coeff) ciphertexts")
    la, lb = _compute_behz_polys(a), _compute_behz_polys(b)
    p0 = polymod.mul_eval(la[0], lb[0])
    p1 = polymod.add(polymod.mul_eval(la[0], lb[1]), polymod.mul_eval(la[1], lb[0]))
    p2 = polymod.mul_eval(la[1], lb[1])
    return Ciphertext(a.context, [p0, p1, p2], correction_factor=1)


def drop_extended_base(ct: Ciphertext) -> Ciphertext:
    """[q, B_sk] -> q: multiply by t, inverse NTT, BEHZ floor
    (Bfv+Multiply.swift:31-48)."""
    count = ct.moduli_count
    if count % 2 != 1 or count < 3:
        raise errors.InvalidCiphertext("extended-base ciphertext must have odd moduli count >= 3")
    scaling_count = (count - 1) // 2
    tool = ct.context.get_rns_tool(scaling_count)
    t = ct.context.plaintext_modulus
    polys = []
    for p in ct.polys:
        scaled = polymod.mul_scalar_rows(p, [t] * count)
        coeff = polymod.inverse_ntt(scaled)
        floored = tool.floor_qbsk_to_q(coeff.word())
        polys.append(PolyRq.from_word(floored, tool.input_context, COEFF))
    return Ciphertext(ct.context, polys, ct.correction_factor)


def ct_mul(a: Ciphertext, b: Ciphertext) -> Ciphertext:
    """Full BEHZ ct*ct, yielding a 3-poly ciphertext (relinearize to get 2)."""
    return drop_extended_base(multiply_without_scaling(a, b))


def inner_product_ct_ct(lhs: list[Ciphertext], rhs: list[Ciphertext]) -> Ciphertext:
    """sum_i lhs_i * rhs_i, accumulated in the extended [q, B_sk] base with a
    single scaling/floor at the end (reference Bfv.swift:236-651)."""
    acc = None
    for a, b in zip(lhs, rhs):
        prod = multiply_without_scaling(a, b)
        if acc is None:
            acc = prod
        else:
            acc = Ciphertext(
                acc.context,
                [polymod.add(x, y) for x, y in zip(acc.polys, prod.polys)],
                acc.correction_factor,
            )
    return drop_extended_base(acc)


# ---------------------------------------------------------------------------
# Key switching: relinearize / Galois / rotations
# ---------------------------------------------------------------------------


def relinearize(ct: Ciphertext, evaluation_key) -> Ciphertext:
    """3 -> 2 polys via the relinearization key (reference Bfv.swift:201-219)."""
    from . import keys as keysmod

    if len(ct.polys) != 3:
        raise errors.InvalidCiphertext("relinearize requires 3 polys")
    if ct.correction_factor != 1:
        raise errors.InvalidCorrectionFactor(str(ct.correction_factor))
    if evaluation_key.relinearization_key is None:
        raise errors.MissingRelinearizationKey()
    update = keysmod.compute_key_switching_update(
        ct.context, ct.polys[2], evaluation_key.relinearization_key.key_switch_key
    )
    c0 = polymod.add(ct.polys[0], update[0])
    c1 = polymod.add(ct.polys[1], update[1])
    return Ciphertext(ct.context, [c0, c1], ct.correction_factor)


def apply_galois(ct: Ciphertext, element: int, evaluation_key) -> Ciphertext:
    """f(x) -> f(x^element) with key switching (reference Bfv.swift:174-198)."""
    from . import keys as keysmod
    from ..ops import galois as galoismod

    if len(ct.polys) != 2:
        raise errors.InvalidCiphertext("applyGalois requires 2 polys")
    if ct.correction_factor != 1:
        raise errors.InvalidCorrectionFactor(str(ct.correction_factor))
    if ct.fmt != COEFF:
        raise errors.InvalidFormat("applyGalois requires canonical (Coeff) format")
    if evaluation_key.galois_key is None or element not in evaluation_key.galois_key.keys:
        raise errors.MissingGaloisKey(str(element))
    ct_ctx = ct.polys[0].context
    import jax.numpy as jnp

    qw = wordmod.as_word(jnp.asarray(ct_ctx.q_arr))
    perm0 = galoismod.apply_galois_coeff(ct.polys[0].word(), qw, element, ct_ctx.word)
    perm1 = galoismod.apply_galois_coeff(ct.polys[1].word(), qw, element, ct_ctx.word)
    update = keysmod.compute_key_switching_update(
        ct.context,
        PolyRq.from_word(perm1, ct_ctx, COEFF),
        evaluation_key.galois_key.keys[element],
    )
    c0 = polymod.add(PolyRq.from_word(perm0, ct_ctx, COEFF), update[0])
    return Ciphertext(ct.context, [c0, update[1]], ct.correction_factor)


def rotate_columns(ct: Ciphertext, step: int, evaluation_key) -> Ciphertext:
    """SIMD column rotation (reference HeScheme.swift:1463-1470)."""
    from ..ops import galois as galoismod

    element = galoismod.rotating_columns_element(step, ct.context.degree)
    return apply_galois(ct, element, evaluation_key)


def swap_rows(ct: Ciphertext, evaluation_key) -> Ciphertext:
    """SIMD row swap (reference HeScheme.swift:1472-1477)."""
    from ..ops import galois as galoismod

    element = galoismod.swapping_rows_element(ct.context.degree)
    return apply_galois(ct, element, evaluation_key)


def ct_mul_relin(a: Ciphertext, b: Ciphertext, evaluation_key) -> Ciphertext:
    return relinearize(ct_mul(a, b), evaluation_key)


def multiply_power_of_x(ct: Ciphertext, power: int) -> Ciphertext:
    """Negacyclic shift of every poly (reference HeScheme.swift:1075)."""
    return Ciphertext(
        ct.context,
        [polymod.multiply_power_of_x(p, power) for p in ct.polys],
        ct.correction_factor,
    )


# ---------------------------------------------------------------------------
# Inner products (PIR hot path; batched kernels in pir/)
# ---------------------------------------------------------------------------


def inner_product_ct_pt(cts: list[Ciphertext], pts: list) -> Ciphertext:
    """sum_i ct_i * pt_i with lazy double-width accumulation
    (reference Bfv.swift:236-651). pts entries may be None (skipped zero
    plaintexts, as in PIR processed databases)."""
    import jax.numpy as jnp

    pairs = [(c, p) for c, p in zip(cts, pts) if p is not None]
    if not pairs:
        raise errors.InvalidCiphertext("empty inner product")
    first_ct = pairs[0][0]
    ct_ctx = pairs[0][1].poly.context
    context = first_ct.context
    nl = ct_ctx.nlimbs
    n_polys = len(first_ct.polys)
    L = len(ct_ctx.moduli)

    # periodic reduction bound (reference reduces at maxLazy/2 intervals,
    # Bfv.swift:266-311)
    cap = max(1, ct_ctx.max_lazy_product_accumulation_count() // 2)
    W = ct_ctx.word

    out_polys = []
    for comp in range(n_polys):
        rows = []
        for i in range(L):
            rc = ct_ctx.row_consts[i]
            qw = ct_ctx.row_word("q", i)
            if nl == 1:
                cdict = {
                    "mu32": np.uint32(rc["mu32"]),
                    "r32": ct_ctx.row_word("r32", i),
                    "r32_shoup": ct_ctx.row_word("r32_shoup", i),
                }
                reduce_acc = lambda a: wordmod.W32.reduce_u64(a[0], a[1], qw, cdict)
            else:
                cdict = {
                    "k": rc["k"],
                    "mu": ct_ctx.row_word("mu", i),
                    "mu32": np.uint32(rc["mu32"]),
                    "r32": ct_ctx.row_word("r32", i),
                    "r32_shoup": ct_ctx.row_word("r32_shoup", i),
                }
                reduce_acc = lambda a: wordmod.W64.reduce_u128(a, qw, cdict)
            total = None
            for start in range(0, len(pairs), cap):
                acc = None
                for ct, pt in pairs[start : start + cap]:
                    cw = tuple(ct.polys[comp].data[l, i] for l in range(nl))
                    pw = tuple(pt.poly.data[l, i] for l in range(nl))
                    if nl == 1:
                        term = limb.mul32(cw[0], pw[0])
                        acc = term if acc is None else limb.add64(acc, term)
                    else:
                        term = limb.mul64(cw, pw)
                        acc = term if acc is None else limb.add128(acc, term)
                red = reduce_acc(acc)
                total = red if total is None else W.add_mod(total, red, qw)
            rows.append(total)
        out_polys.append(
            PolyRq.from_word(polymod._stack_rows(rows), ct_ctx, EVAL)
        )
    return Ciphertext(context, out_polys, first_ct.correction_factor)

"""RNS machinery: approximate base conversion, BEHZ tool, CRT composition.

TPU re-design of the reference's _RnsBaseConverter / _RnsTool / _CrtComposer
(Sources/HomomorphicEncryption/RnsBaseConverter.swift:14-144,
RnsTool.swift:18-475, CrtComposer.swift): all constants precomputed host-side
with Python big ints; the device path is vectorized modular MACs over
[L, N] limb tensors with exact double-width accumulation (wrapping, like
the reference's DoubleWidth accumulators).

Divergence note: the reference's per-level RnsTool slices a shared
[B_0..B_L, m~] chain by prefix, so below the top level the m~ slot is
occupied by an unused B prime (RnsTool.swift:190-199) — a path never
exercised (ct-ct multiply happens before mod-switching). Here every level
gets a consistent [B_level, m_sk, m~] base drawn from the same shared
B_sk prime pool, so lower-level multiplies are actually correct.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax

import numpy as np
import jax.numpy as jnp

from ..ops import limb
from ..ops import word as wordmod
from ..ops.word import W32, W64
from ..utils import nt
from .context import PolyContext, get_poly_context
from . import poly as polymod
from .poly import PolyRq, COEFF




def _jit_when_w32(static_argnums=(0,)):
    """jit a method only for the 1-limb fast path: w64 graphs are large
    enough that XLA compile time is prohibitive for the eager/test path."""

    def deco(method):
        jitted = jax.jit(method, static_argnums=static_argnums)

        @functools.wraps(method)
        def wrapper(self, *args, **kwargs):
            if self.input_context.nlimbs == 1:
                return jitted(self, *args, **kwargs)
            return method(self, *args, **kwargs)

        return wrapper

    return deco

class RnsBaseConverter:
    """Approximate base conversion q -> t (eprint 2016/510 Eq. 2).

    Output coefficients are (x + a_x * q) mod t_j with a_x in [0, L-1].
    """

    def __init__(self, input_context: PolyContext, output_context: PolyContext):
        assert input_context.degree == output_context.degree
        self.input_context = input_context
        self.output_context = output_context
        in_moduli = input_context.moduli
        out_moduli = output_context.moduli
        Q = input_context.q_product
        # (q / q_i) mod t_j  [rows: t_j, cols: q_i]
        self.punctured = [
            [(Q // qi) % tj for qi in in_moduli] for tj in out_moduli
        ]
        # (q/q_i)^{-1} mod q_i with Shoup factors
        self.inv_punctured = []
        for qi in in_moduli:
            v = nt.inverse_mod((Q // qi) % qi, qi)
            self.inv_punctured.append(
                (v, wordmod.shoup_const(v, qi, input_context.scalar_bits))
            )

    def convert_approximate_products(self, x):
        """x: word [L_in, N] -> scaled products x_i * (q_i/q)^{-1} mod q_i."""
        ctx = self.input_context
        W = ctx.word
        rows = []
        for i in range(len(ctx.moduli)):
            v, vs = self.inv_punctured[i]
            rows.append(
                W.mul_shoup(
                    polymod._row(x, i),
                    ctx.scalar_word(v),
                    ctx.scalar_word(vs),
                    ctx.row_word("q", i),
                )
            )
        return polymod._stack_rows(rows)

    def convert_approximate_using(self, products):
        """products: word [L_in, N] -> word [L_out, N] in the output base."""
        in_ctx = self.input_context
        out_ctx = self.output_context
        L_in = len(in_ctx.moduli)
        out_rows = []
        for j, tj in enumerate(out_ctx.moduli):
            rc = out_ctx.row_consts[j]
            qw = out_ctx.row_word("q", j)
            if in_ctx.nlimbs == 1:
                acc = None
                for i in range(L_in):
                    term = limb.mul32(products[0][i], np.uint32(self.punctured[j][i]))
                    acc = term if acc is None else limb.add64(acc, term)
                cw = {
                    "mu32": np.uint32(rc["mu32"]),
                    "r32": out_ctx.row_word("r32", j),
                    "r32_shoup": out_ctx.row_word("r32_shoup", j),
                }
                out_rows.append(W32.reduce_u64(acc[0], acc[1], qw, cw))
            else:
                acc = None
                for i in range(L_in):
                    pw = in_ctx.scalar_word(self.punctured[j][i])
                    term = limb.mul64(polymod._row(products, i), pw)
                    acc = term if acc is None else limb.add128(acc, term)
                cw = {
                    "k": rc["k"],
                    "mu": out_ctx.row_word("mu", j),
                    "mu32": np.uint32(rc["mu32"]),
                    "r32": out_ctx.row_word("r32", j),
                    "r32_shoup": out_ctx.row_word("r32_shoup", j),
                }
                out_rows.append(W64.reduce_u128(acc, qw, cw))
        return polymod._stack_rows(out_rows)

    def convert_approximate(self, x):
        """x: word [L_in, N] coeff -> word [L_out, N]."""
        return self.convert_approximate_using(self.convert_approximate_products(x))

    def crt_compose(self, values: np.ndarray) -> np.ndarray:
        """Host-exact CRT composition: object array [L, N] -> [N] ints in [0, Q)."""
        Q = self.input_context.q_product
        moduli = self.input_context.moduli
        out = np.zeros(values.shape[1], dtype=object)
        for i, qi in enumerate(moduli):
            gi = Q // qi
            inv = nt.inverse_mod(gi % qi, qi)
            out += (values[i] * inv % qi) * gi
        return out % Q


@lru_cache(maxsize=None)
def bsk_prime_pool(degree: int, top_moduli_count: int, scalar_bits: int) -> tuple[int, ...]:
    """Shared B_sk prime pool: top_moduli_count+1 primes of (bits-3) bits,
    preferring small, NTT-friendly (reference RnsTool.swift:29-36)."""
    bits = scalar_bits
    return tuple(
        nt.generate_primes(
            [bits - 3] * (top_moduli_count + 1),
            preferring_small=True,
            ntt_degree=degree,
            bit_width=bits,
        )
    )


class RnsTool:
    """Per-level BEHZ tool (eprint 2016/510): input base q = q_0..q_{L-1},
    output modulus t, auxiliary base B_sk = [B, m_sk] plus m~."""

    def __init__(
        self,
        input_context: PolyContext,
        t: int,
        bsk_pool: tuple[int, ...],
    ):
        self.input_context = input_context
        self.t = t
        bits = input_context.scalar_bits
        degree = input_context.degree
        L = len(input_context.moduli)
        self.gamma = (1 << 30) - 20405 if bits == 32 else (1 << 62) - 40797
        self.m_tilde = 1 << 16 if bits == 32 else 1 << 32

        self.output_context = get_poly_context(degree, (t,), bits)
        self.t_gamma_context = get_poly_context(degree, (t, self.gamma), bits)

        bsk_moduli = bsk_pool[: L + 1]
        self.bsk_context = get_poly_context(degree, bsk_moduli, bits)
        self.b_context = get_poly_context(degree, bsk_moduli[:-1], bits)
        self.m_sk = bsk_moduli[-1]
        self.bsk_mtilde_context = get_poly_context(
            degree, bsk_moduli + (self.m_tilde,), bits
        )
        self.q_bsk_context = get_poly_context(
            degree, input_context.moduli + bsk_moduli, bits
        )

        Q = input_context.q_product
        B = self.b_context.q_product
        self.q_mod_t = Q % t
        self.t_threshold = (t + 1) // 2
        gamma_t = self.gamma * t
        self.prod_gamma_t_mod_q = [gamma_t % qi for qi in input_context.moduli]
        self.inverse_gamma_mod_t = nt.inverse_mod(self.gamma % t, t)
        self.neg_inverse_q_mod_t_gamma = [
            (-nt.inverse_mod(Q % m, m)) % m for m in (t, self.gamma)
        ]
        self.neg_inverse_q_mod_m_tilde = (-nt.inverse_mod(Q % self.m_tilde, self.m_tilde)) % self.m_tilde
        self.q_div_t = [(Q // t) % qi for qi in input_context.moduli]
        self.m_tilde_mod_q = [self.m_tilde % qi for qi in input_context.moduli]
        self.q_mod_bsk = [Q % m for m in bsk_moduli]
        self.inverse_m_tilde_mod_bsk = [
            nt.inverse_mod(self.m_tilde % m, m) for m in bsk_moduli
        ]
        self.inverse_q_mod_bsk = [nt.inverse_mod(Q % m, m) for m in bsk_moduli]
        self.inverse_b_mod_m_sk = nt.inverse_mod(B % self.m_sk, self.m_sk)
        self.b_mod_q = [B % qi for qi in input_context.moduli]

        self.convert_q_to_t_gamma = RnsBaseConverter(input_context, self.t_gamma_context)
        self.convert_q_to_bsk = RnsBaseConverter(input_context, self.bsk_context)
        self.convert_q_to_bsk_mtilde = RnsBaseConverter(
            input_context, self.bsk_mtilde_context
        )
        self.convert_b_to_m_sk = RnsBaseConverter(
            self.b_context, get_poly_context(degree, (self.m_sk,), bits)
        )
        self.convert_b_to_q = RnsBaseConverter(self.b_context, input_context)

    # -- decryption scaling -------------------------------------------------

    @_jit_when_w32(static_argnums=(0, 2))
    def scale_and_round(self, x, scaling_factor: int):
        """BEHZ Alg 2 decryption scaling (RnsTool.swift:272-302).

        x: word [L, N] coeff holding Delta*m + v; returns word [1, N] mod t.
        """
        ctx = self.input_context
        W = ctx.word
        tg = self.t_gamma_context
        t = self.t

        y = polymod.mul_scalar_rows(
            PolyRq.from_word(x, ctx, COEFF), self.prod_gamma_t_mod_q
        ).word()
        z = self.convert_q_to_t_gamma.convert_approximate(y)
        # z rows: [mod t, mod gamma]; multiply by -(Q^{-1}) mod {t, gamma}
        rows = []
        for j in range(2):
            c = self.neg_inverse_q_mod_t_gamma[j]
            qj = tg.moduli[j]
            rows.append(
                W.mul_shoup(
                    polymod._row(z, j),
                    tg.scalar_word(c),
                    tg.scalar_word(wordmod.shoup_const(c, qj, ctx.scalar_bits)),
                    tg.row_word("q", j),
                )
            )
        poly_mod_t, poly_mod_gamma = rows

        out_ctx = self.output_context
        t_rc = out_ctx.row_consts[0]
        tw = out_ctx.row_word("q", 0)

        def reduce_mod_t(v):
            """v: word holding value < gamma -> value mod t."""
            if ctx.nlimbs == 1:
                return W32.reduce_u32(v, tw, (np.uint32(t_rc["mu32"]),))
            cw = {
                "k": t_rc["k"],
                "mu": out_ctx.row_word("mu", 0),
                "mu32": np.uint32(t_rc["mu32"]),
                "r32": out_ctx.row_word("r32", 0),
                "r32_shoup": out_ctx.row_word("r32_shoup", 0),
            }
            return W64.reduce_u64_any(v, tw, cw)

        gamma_w = tg.scalar_word(self.gamma)
        corrected_gamma = self.gamma // 2
        # gamma - polyModGamma (no wrap: polyModGamma < gamma)
        if ctx.nlimbs == 1:
            diff = (gamma_w[0] - poly_mod_gamma[0],)
            exceeds = poly_mod_gamma[0] > np.uint32(corrected_gamma)
        else:
            diff = limb.sub64(gamma_w, poly_mod_gamma)
            exceeds = limb.lt64(tg.scalar_word(corrected_gamma), poly_mod_gamma)
        s_greater = W.neg_mod(reduce_mod_t(diff), tw)
        s_less = reduce_mod_t(poly_mod_gamma)
        s_gamma = tuple(jnp.where(exceeds, g, l) for g, l in zip(s_greater, s_less))
        result = W.sub_mod(poly_mod_t, s_gamma, tw)

        c = (self.inverse_gamma_mod_t * (scaling_factor % t)) % t
        result = W.mul_shoup(
            result,
            out_ctx.scalar_word(c),
            out_ctx.scalar_word(wordmod.shoup_const(c, t, ctx.scalar_bits)),
            tw,
        )
        return tuple(r[None] for r in result)

    # -- BEHZ ct-ct multiply machinery (eprint 2016/510) --------------------

    def _shoup_mul_row(self, ctx: PolyContext, row, c: int, q: int):
        """row word * host constant c mod q (Shoup)."""
        W = ctx.word
        return W.mul_shoup(
            row,
            ctx.scalar_word(c % q),
            ctx.scalar_word(wordmod.shoup_const(c % q, q, ctx.scalar_bits)),
            ctx.scalar_word(q),
        )

    def convert_approximate_bsk_mtilde(self, x):
        """Alg 1: x*m~ mod q, approximately converted to [B_sk, m~]
        (RnsTool.swift:313-316). x: word [L, N] coeff."""
        ctx = self.input_context
        scaled = polymod.mul_scalar_rows(
            PolyRq.from_word(x, ctx, COEFF), self.m_tilde_mod_q
        ).word()
        return self.convert_q_to_bsk_mtilde.convert_approximate(scaled)

    def small_montgomery_reduce(self, y):
        """Montgomery correction: input word [L_bsk+1, N] over [B_sk, m~]
        -> word [L_bsk, N] over B_sk, multiplied by m~^{-1} mod q
        (RnsTool.swift:339-368)."""
        bctx = self.bsk_context
        W = bctx.word
        L_bsk = len(bctx.moduli)
        m_tilde = self.m_tilde
        mask = m_tilde - 1
        r = polymod._row(y, L_bsk)  # m~ row
        # r_mtilde = -(Q^{-1}) * r mod m~  (m~ is a power of two)
        neg_inv = self.neg_inverse_q_mod_m_tilde
        if bctx.nlimbs == 1:
            r_mtilde = ((r[0] * np.uint32(neg_inv)) & np.uint32(mask),)
            less = r_mtilde[0] < np.uint32(m_tilde >> 1)
        else:
            prod = limb.mullo64(r, bctx.scalar_word(neg_inv))
            mw = bctx.scalar_word(mask)
            r_mtilde = (prod[0] & mw[0], prod[1] & mw[1])
            less = limb.lt64(r_mtilde, bctx.scalar_word(m_tilde >> 1))
        rows = []
        for i, bsk in enumerate(bctx.moduli):
            qw = bctx.row_word("q", i)
            # center r_mtilde: if >= m~/2, use r_mtilde + bsk - m~ (wrapping)
            if bctx.nlimbs == 1:
                shifted = (r_mtilde[0] + np.uint32(bsk) - np.uint32(m_tilde),)
            else:
                shifted = limb.add64(
                    limb.sub64(r_mtilde, bctx.scalar_word(m_tilde)), bctx.scalar_word(bsk)
                )
            rm = tuple(jnp.where(less, a, b) for a, b in zip(r_mtilde, shifted))
            # poly += qModBsk * rm (lazy), then * m~^{-1} mod bsk
            q_mod = self.q_mod_bsk[i]
            lazy = W.mul_shoup_lazy(
                rm,
                bctx.scalar_word(q_mod % bsk),
                bctx.scalar_word(wordmod.shoup_const(q_mod % bsk, bsk, bctx.scalar_bits)),
                qw,
            )
            if bctx.nlimbs == 1:
                acc = (polymod._row(y, i)[0] + lazy[0],)
            else:
                acc = limb.add64(polymod._row(y, i), lazy)
            inv_mt = self.inverse_m_tilde_mod_bsk[i]
            rows.append(
                W.mul_shoup(
                    acc,
                    bctx.scalar_word(inv_mt),
                    bctx.scalar_word(wordmod.shoup_const(inv_mt, bsk, bctx.scalar_bits)),
                    qw,
                )
            )
        return polymod._stack_rows(rows)

    @_jit_when_w32()
    def lift_q_to_qbsk(self, x):
        """Alg 2: word [L, N] over q -> word [L + L_bsk, N] over [q, B_sk]
        (RnsTool.swift:324-331)."""
        bsk = self.small_montgomery_reduce(self.convert_approximate_bsk_mtilde(x))
        return tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(x, bsk))

    def approximate_floor(self, y):
        """Uncorrected RNS floor: word [L + L_bsk, N] over [q, B_sk] ->
        word [L_bsk, N] = floor(x/q) + a_x over B_sk (RnsTool.swift:378-398)."""
        L = len(self.input_context.moduli)
        bctx = self.bsk_context
        W = bctx.word
        x_q = tuple(a[:L] for a in y)
        x_bsk = tuple(a[L:] for a in y)
        conv = self.convert_q_to_bsk.convert_approximate(x_q)
        rows = []
        for i, bsk in enumerate(bctx.moduli):
            qw = bctx.row_word("q", i)
            # inverseQModBsk * (x_bsk + bsk - conv)  [input in (0, 2bsk)]
            if bctx.nlimbs == 1:
                diff = (polymod._row(x_bsk, i)[0] + np.uint32(bsk) - polymod._row(conv, i)[0],)
            else:
                diff = limb.add64(
                    limb.sub64(polymod._row(x_bsk, i), polymod._row(conv, i)),
                    bctx.scalar_word(bsk),
                )
            inv_q = self.inverse_q_mod_bsk[i]
            rows.append(
                W.mul_shoup(
                    diff,
                    bctx.scalar_word(inv_q),
                    bctx.scalar_word(wordmod.shoup_const(inv_q, bsk, bctx.scalar_bits)),
                    qw,
                )
            )
        return polymod._stack_rows(rows)

    def convert_approximate_bsk_to_q(self, y):
        """Shenoy-Kumaresan with m_sk centering: word [L_bsk, N] over B_sk ->
        word [L, N] over q (RnsTool.swift:402-450)."""
        ctx = self.input_context
        bctx = self.b_context
        W = ctx.word
        L_b = len(bctx.moduli)
        x_b = tuple(a[:L_b] for a in y)
        x_msk = tuple(a[L_b:][0] for a in y)  # [N]
        m_sk = self.m_sk
        products = self.convert_b_to_m_sk.convert_approximate_products(x_b)
        alpha = polymod._row(self.convert_b_to_m_sk.convert_approximate_using(products), 0)
        msk_ctx = self.convert_b_to_m_sk.output_context
        # alpha = B^{-1} * (alpha + m_sk - x_msk) mod m_sk
        if ctx.nlimbs == 1:
            diff = (alpha[0] + np.uint32(m_sk) - x_msk[0],)
        else:
            diff = limb.add64(limb.sub64(alpha, x_msk), msk_ctx.scalar_word(m_sk))
        inv_b = self.inverse_b_mod_m_sk
        alpha = W.mul_shoup(
            diff,
            msk_ctx.scalar_word(inv_b),
            msk_ctx.scalar_word(wordmod.shoup_const(inv_b, m_sk, ctx.scalar_bits)),
            msk_ctx.row_word("q", 0),
        )
        if ctx.nlimbs == 1:
            exceeds = alpha[0] > np.uint32(m_sk >> 1)
            msk_minus_alpha = (np.uint32(m_sk) - alpha[0],)
        else:
            exceeds = limb.lt64(msk_ctx.scalar_word(m_sk >> 1), alpha)
            msk_minus_alpha = limb.sub64(msk_ctx.scalar_word(m_sk), alpha)

        products_q = self.convert_b_to_q.convert_approximate_products(x_b)
        out = self.convert_b_to_q.convert_approximate_using(products_q)
        rows = []
        for i, qi in enumerate(ctx.moduli):
            qw = ctx.row_word("q", i)
            b_mod = self.b_mod_q[i]
            adj_gt = self._shoup_mul_row(ctx, msk_minus_alpha, b_mod, qi)
            adj_le = self._shoup_mul_row(ctx, alpha, (-b_mod) % qi, qi)
            adj = tuple(jnp.where(exceeds, g, l) for g, l in zip(adj_gt, adj_le))
            rows.append(W.add_mod(polymod._row(out, i), adj, qw))
        return polymod._stack_rows(rows)

    @_jit_when_w32()
    def floor_qbsk_to_q(self, y):
        """word [L + L_bsk, N] over [q, B_sk] -> floor(x/q) over q
        (RnsTool.swift:453-456)."""
        return self.convert_approximate_bsk_to_q(self.approximate_floor(y))

    # -- host helpers -------------------------------------------------------

    def crt_compose(self, values: np.ndarray) -> np.ndarray:
        return self.convert_q_to_bsk.crt_compose(values)

"""PolyRq: RNS polynomial residue tensors + device ops.

A polynomial in R_q is a uint32 limb tensor [W, L, N] (W = limbs per word,
L = RNS moduli, N = degree), RNS-major like the reference's Array2d layout
(Sources/HomomorphicEncryption/PolyRq/PolyRq.swift:21-52). PolyRq is a jax
pytree whose context/format are static, so scheme-level functions jit
directly over polynomials.

Formats: COEFF (coefficient domain) and EVAL (NTT domain), enforced at the
op level like the reference's phantom types.
"""

from __future__ import annotations

from dataclasses import dataclass

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import errors
from ..ops import ntt as nttmod
from ..ops import word as wordmod
from .context import PolyContext

COEFF = "coeff"
EVAL = "eval"


@dataclass
class PolyRq:
    data: jax.Array  # [W, L, N] uint32
    context: PolyContext
    fmt: str

    def tree_flatten(self):
        return (self.data,), (self.context, self.fmt)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def degree(self) -> int:
        return self.context.degree

    @property
    def moduli(self):
        return self.context.moduli

    def word(self):
        return tuple(self.data[i] for i in range(self.context.nlimbs))

    @classmethod
    def from_word(cls, w, context: PolyContext, fmt: str) -> "PolyRq":
        return cls(jnp.stack(w), context, fmt)

    @classmethod
    def zero(cls, context: PolyContext, fmt: str = COEFF) -> "PolyRq":
        return cls(
            jnp.zeros((context.nlimbs, len(context.moduli), context.degree), dtype=jnp.uint32),
            context,
            fmt,
        )

    @classmethod
    def from_values(cls, values, context: PolyContext, fmt: str = COEFF) -> "PolyRq":
        """values: numpy object array [L, N] of ints in [0, q_i)."""
        return cls(jnp.asarray(wordmod.pack(values, context.nlimbs)), context, fmt)

    def to_values(self) -> np.ndarray:
        """-> numpy object array [L, N]."""
        return wordmod.unpack(np.asarray(self.data))

    def is_zero(self) -> bool:
        return not bool(np.asarray(self.data).any())


jax.tree_util.register_pytree_node(
    PolyRq, PolyRq.tree_flatten, lambda aux, ch: PolyRq.tree_unflatten(aux, ch)
)


def _check_same(a: PolyRq, b: PolyRq):
    if a.context is not b.context:
        raise errors.IncompatibleContexts(f"{a.context} vs {b.context}")
    if a.fmt != b.fmt:
        raise errors.InvalidFormat(f"{a.fmt} vs {b.fmt}")


def _qw(ctx: PolyContext):
    return wordmod.as_word(jnp.asarray(ctx.q_arr))


@jax.jit
def add(a: PolyRq, b: PolyRq) -> PolyRq:
    _check_same(a, b)
    W = a.context.word
    return PolyRq.from_word(W.add_mod(a.word(), b.word(), _qw(a.context)), a.context, a.fmt)


@jax.jit
def sub(a: PolyRq, b: PolyRq) -> PolyRq:
    _check_same(a, b)
    W = a.context.word
    return PolyRq.from_word(W.sub_mod(a.word(), b.word(), _qw(a.context)), a.context, a.fmt)


@jax.jit
def neg(a: PolyRq) -> PolyRq:
    W = a.context.word
    return PolyRq.from_word(W.neg_mod(a.word(), _qw(a.context)), a.context, a.fmt)


def _row(w, i):
    """Row i of a word of [..., L, N] arrays -> word of [..., N]."""
    return tuple(x[..., i, :] for x in w)


def _stack_rows(rows):
    """list of L words of [..., N] -> word of [..., L, N]."""
    nl = len(rows[0])
    return tuple(jnp.stack([r[l] for r in rows], axis=-2) for l in range(nl))


@jax.jit
def mul_eval(a: PolyRq, b: PolyRq) -> PolyRq:
    """Pointwise product in Eval format (reference PolyRq *=,
    PolyRq.swift:184-204). Per-row Barrett with static k."""
    _check_same(a, b)
    if a.fmt != EVAL:
        raise errors.InvalidFormat("multiplication requires Eval format")
    ctx = a.context
    W = ctx.word
    aw, bw = a.word(), b.word()
    rows = []
    for i, rc in enumerate(ctx.row_consts):
        q = ctx.row_word("q", i)
        mu = ctx.row_word("mu", i)
        rows.append(W.mulmod(_row(aw, i), _row(bw, i), q, rc["k"], mu))
    return PolyRq.from_word(_stack_rows(rows), ctx, EVAL)


@functools.partial(jax.jit, static_argnums=2)
def mul_poly_rows(a: PolyRq, other_word, other_context: PolyContext) -> PolyRq:
    """Pointwise product with the matching leading rows of another poly's
    word (e.g. a secret key over a larger context). Used by encrypt/decrypt
    (reference PolyRq.mulAssign(secretPoly:))."""
    ctx = a.context
    W = ctx.word
    aw = a.word()
    rows = []
    for i, rc in enumerate(ctx.row_consts):
        q = ctx.row_word("q", i)
        mu = ctx.row_word("mu", i)
        rows.append(W.mulmod(_row(aw, i), _row(other_word, i), q, rc["k"], mu))
    return PolyRq.from_word(_stack_rows(rows), ctx, a.fmt)


def mul_scalar_rows(a: PolyRq, constants) -> PolyRq:
    """Multiply row i by host constant constants[i] (Shoup), matching
    reference PolyRq *= [T] (PolyRq.swift:232-245)."""
    return _mul_scalar_rows(a, tuple(constants))


@functools.partial(jax.jit, static_argnums=1)
def _mul_scalar_rows(a: PolyRq, constants) -> PolyRq:
    ctx = a.context
    W = ctx.word
    aw = a.word()
    rows = []
    for i, q in enumerate(ctx.moduli):
        c = constants[i] % q
        w = ctx.scalar_word(c)
        ws = ctx.scalar_word(wordmod.shoup_const(c, q, ctx.scalar_bits))
        rows.append(W.mul_shoup(_row(aw, i), w, ws, ctx.row_word("q", i)))
    return PolyRq.from_word(_stack_rows(rows), ctx, a.fmt)


@jax.jit
def forward_ntt(a: PolyRq) -> PolyRq:
    if a.fmt != COEFF:
        raise errors.InvalidFormat("forward NTT requires Coeff")
    out = nttmod.forward_ntt(a.word(), a.context.ntt_tables)
    return PolyRq.from_word(out, a.context, EVAL)


@jax.jit
def inverse_ntt(a: PolyRq) -> PolyRq:
    if a.fmt != EVAL:
        raise errors.InvalidFormat("inverse NTT requires Eval")
    out = nttmod.inverse_ntt(a.word(), a.context.ntt_tables)
    return PolyRq.from_word(out, a.context, COEFF)


def drop_context(a: PolyRq, target: PolyContext) -> PolyRq:
    """Keep only the first len(target.moduli) RNS rows (reference
    PolyRq.dropContext, PolyRq.swift:318-329)."""
    if target.moduli != a.context.moduli[: len(target.moduli)]:
        raise errors.IncompatibleContexts("dropContext target is not a prefix")
    return PolyRq(a.data[:, : len(target.moduli), :], target, a.fmt)


@jax.jit
def divide_and_round_q_last(a: PolyRq) -> PolyRq:
    """Divide+round by the last modulus, dropping it — BFV mod switch
    (reference PolyRq.divideAndRoundQLast, PolyRq.swift:365-393;
    Alg 8 of HPS / Alg 2 of eprint 2018/931)."""
    if a.fmt != COEFF:
        raise errors.InvalidFormat("divideAndRoundQLast requires Coeff")
    ctx = a.context
    nxt = ctx.next
    if nxt is None:
        raise errors.IncompatibleContexts("no next context")
    W = ctx.word
    L = len(ctx.moduli)
    q_last = ctx.moduli[-1]
    half = q_last >> 1
    aw = a.word()
    last = _row(aw, L - 1)
    q_last_w = ctx.row_word("q", L - 1)
    last_plus = W.add_mod(last, ctx.scalar_word(half), q_last_w)
    inv_tabs = ctx.inverse_q_last
    rows = []
    for i, q in enumerate(ctx.moduli[:-1]):
        rc = ctx.row_consts[i]
        qw = ctx.row_word("q", i)
        if ctx.nlimbs == 1:
            tmp = W.reduce_u32(last_plus, qw, (np.uint32(rc["mu32"]),))
        else:
            cw = {
                "k": rc["k"],
                "mu": ctx.row_word("mu", i),
                "mu32": np.uint32(rc["mu32"]),
                "r32": ctx.row_word("r32", i),
                "r32_shoup": ctx.row_word("r32_shoup", i),
            }
            tmp = W.reduce_u64_any(last_plus, qw, cw)
        half_mod = ctx.scalar_word(half % q)
        coeff = W.add_mod(_row(aw, i), half_mod, qw)
        coeff = W.sub_mod(coeff, tmp, qw)
        inv = inv_tabs[i]
        rows.append(
            W.mul_shoup(coeff, ctx.scalar_word(inv["v"]), ctx.scalar_word(inv["shoup"]), qw)
        )
    return PolyRq.from_word(_stack_rows(rows), nxt, COEFF)


@functools.partial(jax.jit, static_argnums=1)
def multiply_power_of_x(a: PolyRq, power: int) -> PolyRq:
    """Negacyclic multiply by x^power (reference PolyRq.multiplyPowerOfX,
    PolyRq.swift:398-422). `power` is static (specializes the jit trace)."""
    if a.fmt != COEFF:
        raise errors.InvalidFormat("multiplyPowerOfX requires Coeff")
    ctx = a.context
    n = ctx.degree
    abs_step = abs(power) % (2 * n)
    if abs_step == 0:
        return a
    rot = -(abs_step % n) if power < 0 else (abs_step % n)
    rolled = jnp.roll(a.data, rot, axis=-1)
    neg_mask = np.zeros(n, dtype=bool)
    if power < 0 and abs_step < n:
        neg_mask[n - abs_step : n] = True
    elif power < 0:
        neg_mask[0 : 2 * n - abs_step] = True
    elif abs_step < n:
        neg_mask[0:abs_step] = True
    else:
        neg_mask[abs_step - n : n] = True
    W = ctx.word
    w = tuple(rolled[i] for i in range(ctx.nlimbs))
    negated = W.neg_mod(w, _qw(ctx))
    mask = jnp.asarray(neg_mask)
    out = tuple(jnp.where(mask, nl, wl) for nl, wl in zip(negated, w))
    return PolyRq.from_word(out, ctx, COEFF)

"""Evaluation keys: hybrid key-switching (alpha=1) with RNS decomposition.

Reference: Sources/HomomorphicEncryption/Bfv/Bfv+Keys.swift:14-209 and
Keys.swift:19-283 — one special key-switching modulus q_ks (the last
coefficient modulus), key-switch keys are seeded encryptions of 0 over the
full key-switching context with q_ks * currentKey folded into c0, and the
update computes per-extended-modulus lazy double-width inner products
(eprint 2021/204 App. B.2.3 + HPS trick).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .. import errors
from ..core import poly as polymod
from ..core.context import get_poly_context
from ..ops import ntt as nttmod
from ..core.poly import COEFF, EVAL, PolyRq
from ..ops import galois as galoismod
from ..ops import limb
from ..ops import word as wordmod
from ..rng.ctr_drbg import SystemRng


@dataclass
class KeySwitchKey:
    """One 2-poly Eval ciphertext per decompose modulus, over the full
    key-switching context {q_0..q_{L-1}, q_ks}."""

    ciphertexts: list  # list[Ciphertext] (Eval)


jax.tree_util.register_pytree_node(
    KeySwitchKey,
    lambda k: ((k.ciphertexts,), ()),
    lambda aux, ch: KeySwitchKey(ch[0]),
)


@dataclass
class GaloisKey:
    keys: dict  # element -> KeySwitchKey


@dataclass
class RelinearizationKey:
    key_switch_key: KeySwitchKey


@dataclass
class EvaluationKey:
    galois_key: GaloisKey | None = None
    relinearization_key: RelinearizationKey | None = None


jax.tree_util.register_pytree_node(
    GaloisKey,
    lambda g: (tuple(g.keys[k] for k in sorted(g.keys)), tuple(sorted(g.keys))),
    lambda aux, ch: GaloisKey(dict(zip(aux, ch))),
)
jax.tree_util.register_pytree_node(
    RelinearizationKey,
    lambda r: ((r.key_switch_key,), ()),
    lambda aux, ch: RelinearizationKey(ch[0]),
)
jax.tree_util.register_pytree_node(
    EvaluationKey,
    lambda e: ((e.galois_key, e.relinearization_key), ()),
    lambda aux, ch: EvaluationKey(ch[0], ch[1]),
)


@dataclass(frozen=True)
class EvaluationKeyConfig:
    """Reference Keys.swift:222-283."""

    galois_elements: tuple[int, ...] = ()
    has_relinearization_key: bool = False

    def union(self, other: "EvaluationKeyConfig") -> "EvaluationKeyConfig":
        return EvaluationKeyConfig(
            tuple(sorted(set(self.galois_elements) | set(other.galois_elements))),
            self.has_relinearization_key or other.has_relinearization_key,
        )

    def contains(self, other: "EvaluationKeyConfig") -> bool:
        return set(other.galois_elements) <= set(self.galois_elements) and (
            self.has_relinearization_key or not other.has_relinearization_key
        )

    @property
    def key_count(self) -> int:
        return len(self.galois_elements) + (1 if self.has_relinearization_key else 0)


def generate_key_switch_key(context, current_key_word, target_key, err_rng=None):
    """Key-switch key from `current_key` (Eval word over >= L_top rows) to
    the target secret key (reference Bfv+Keys.swift:69-103)."""
    from . import bfv as bfvmod

    if not context.supports_evaluation_key:
        raise errors.HeError("parameters do not support evaluation keys")
    ks_ctx = context.key_switching_contexts[-1]
    ct_ctx = context.ciphertext_context
    q_ks = context.key_switch_modulus
    ciphers = []
    for i, qi in enumerate(ct_ctx.moduli):
        ct = bfvmod.encrypt_zero(
            context, target_key, err_rng=err_rng, poly_context=ks_ctx
        )
        ct = bfvmod.ct_to_eval(ct)
        # c0.row[i] += (q_ks mod q_i) * currentKey.row[i] mod q_i
        W = ks_ctx.word
        c0 = ct.polys[0]
        c0w = c0.word()
        row = polymod._row(c0w, i)
        cur = polymod._row(current_key_word, i)
        c = q_ks % qi
        prod = W.mul_shoup(
            cur,
            ks_ctx.scalar_word(c),
            ks_ctx.scalar_word(wordmod.shoup_const(c, qi, ks_ctx.scalar_bits)),
            ks_ctx.row_word("q", i),
        )
        new_row = W.add_mod(row, prod, ks_ctx.row_word("q", i))
        data = c0.data
        for l in range(ks_ctx.nlimbs):
            data = data.at[l, i].set(new_row[l])
        ct.polys[0] = PolyRq(data, ks_ctx, EVAL)
        ct.seed = None
        ciphers.append(ct)
    return KeySwitchKey(ciphers)


def generate_relinearization_key(context, secret_key, err_rng=None) -> RelinearizationKey:
    sk_ctx = context.secret_key_context
    sk = secret_key.poly
    s2 = polymod.mul_eval(sk, sk)
    return RelinearizationKey(
        generate_key_switch_key(context, s2.word(), secret_key, err_rng=err_rng)
    )


def generate_galois_key(context, secret_key, elements, err_rng=None) -> GaloisKey:
    keys = {}
    for element in elements:
        if element in keys:
            continue
        switched = galoismod.apply_galois_eval(secret_key.poly.word(), element)
        keys[element] = generate_key_switch_key(
            context, switched, secret_key, err_rng=err_rng
        )
    return GaloisKey(keys)


def generate_evaluation_key(
    context, config: EvaluationKeyConfig, secret_key, err_rng=None
) -> EvaluationKey:
    galois = (
        generate_galois_key(context, secret_key, config.galois_elements, err_rng)
        if config.galois_elements
        else None
    )
    relin = (
        generate_relinearization_key(context, secret_key, err_rng)
        if config.has_relinearization_key
        else None
    )
    return EvaluationKey(galois, relin)


def compute_key_switching_update(context, target: PolyRq, ksk: KeySwitchKey):
    if target.context.nlimbs == 1:
        return _compute_key_switching_update_jit(context, target, ksk)
    return _compute_key_switching_update(context, target, ksk)


def _compute_key_switching_update_w32(context, target: PolyRq, ksk: KeySwitchKey):
    """Row-vectorized w32 variant of the key-switching update (one batched
    forward NTT over all (digit, ks-modulus) pairs, one lazy u64 MAC, one
    batched inverse NTT). Bit-identical to _compute_key_switching_update
    and ~10% faster in isolation, but measured ~35% slower inside the
    jitted PIR expansion on v5e (XLA fuses the surrounding Galois gather
    into the 3-way digit broadcast and re-executes it per ks modulus;
    optimization_barrier did not prevent it), so the dispatcher keeps the
    per-modulus path. Retained for future profiling."""
    if target.fmt != COEFF:
        raise errors.InvalidFormat("key switch target must be Coeff")
    t_ctx = target.context
    L_t = len(t_ctx.moduli)
    ks_ctx = context.key_switching_contexts[L_t - 1]
    L_ks = L_t + 1
    n_components = len(ksk.ciphertexts[0].polys)
    N = t_ctx.degree

    q_row = jnp.asarray(ks_ctx.q_arr[0])  # [L_ks, 1]
    mu32_row = jnp.asarray(
        ks_ctx.const(
            "mu32_rows",
            lambda: np.array(
                [c["mu32"] for c in ks_ctx.row_consts], dtype=object
            )[:, None],
        )[0]
    )
    r32_row = jnp.asarray(
        ks_ctx.const(
            "r32_rows",
            lambda: np.array(
                [c["r32"] for c in ks_ctx.row_consts], dtype=object
            )[:, None],
        )[0]
    )
    r32s_row = jnp.asarray(
        ks_ctx.const(
            "r32_shoup_rows",
            lambda: np.array(
                [c["r32_shoup"] for c in ks_ctx.row_consts], dtype=object
            )[:, None],
        )[0]
    )

    # [L_t digits, L_ks moduli, N]: digit j reduced mod each ks modulus
    # (reduce_u32 is exact for arbitrary inputs, so rows where q_j <= q_i
    # pass through unchanged). The barrier materializes the target once —
    # without it XLA fuses the producer (a Galois gather on the applyGalois
    # path) into the broadcast and re-executes it per ks modulus.
    base = jax.lax.optimization_barrier(target.data[0])
    x = jnp.broadcast_to(base[:, None, :], (L_t, L_ks, N))
    (x,) = wordmod.W32.reduce_u32((x,), (q_row,), (mu32_row,))
    (fwd,) = nttmod.forward_ntt((x,), ks_ctx.ntt_tables)  # [L_t, L_ks, N]

    cw = {"mu32": mu32_row, "r32": (r32_row,), "r32_shoup": (r32s_row,)}
    comps = []
    for comp in range(n_components):
        acc_lo = acc_hi = None
        for j in range(L_t):
            kd = ksk.ciphertexts[j].polys[comp].data[0]  # [L_top_ks, N]
            krows = jnp.concatenate([kd[:L_t], kd[-1:]], axis=0)  # [L_ks, N]
            lo, hi = limb.mul32(fwd[j], krows)
            if acc_lo is None:
                acc_lo, acc_hi = lo, hi
            else:
                s = acc_lo + lo
                carry = (s < acc_lo).astype(jnp.uint32)
                acc_lo = s
                acc_hi = acc_hi + hi + carry
        comps.append(
            wordmod.W32.reduce_u64(acc_lo, acc_hi, (q_row,), cw)[0]
        )
    stacked = jnp.stack(comps)  # [n_comp, L_ks, N]
    (inv,) = nttmod.inverse_ntt((stacked,), ks_ctx.ntt_tables)
    updates = []
    for comp in range(n_components):
        p = PolyRq(inv[comp][None], ks_ctx, COEFF)
        updates.append(polymod.divide_and_round_q_last(p))
    return updates


_compute_key_switching_update_w32_jit = jax.jit(
    _compute_key_switching_update_w32, static_argnums=0
)


def _compute_key_switching_update(context, target: PolyRq, ksk: KeySwitchKey):
    """Key-switching update for a Coeff target polynomial: returns
    [u0, u1] Coeff polys over the target's context
    (reference Bfv+Keys.swift:123-208)."""
    if target.fmt != COEFF:
        raise errors.InvalidFormat("key switch target must be Coeff")
    t_ctx = target.context
    L_t = len(t_ctx.moduli)
    ks_ctx = context.key_switching_contexts[L_t - 1]
    top_ks_ctx = context.key_switching_contexts[-1]
    degree = t_ctx.degree
    nl = t_ctx.nlimbs
    n_components = len(ksk.ciphertexts[0].polys)
    tw = target.word()

    out_rows = [[] for _ in range(n_components)]  # per component, per rns row
    for rns_index in range(L_t + 1):
        key_modulus = ks_ctx.moduli[rns_index]
        # the key ciphertexts live over the top KS context; its q_ks row is last
        key_row = (
            len(top_ks_ctx.moduli) - 1 if rns_index == L_t else rns_index
        )
        km_ctx = get_poly_context(degree, (key_modulus,), t_ctx.scalar_bits)
        km_rc = km_ctx.row_consts[0]
        # gather decompose rows, reduced mod key_modulus where needed
        bufs = []
        for j in range(L_t):
            qj = t_ctx.moduli[j]
            row = polymod._row(tw, j)
            if qj > key_modulus:
                if nl == 1:
                    row = wordmod.W32.reduce_u32(
                        row, km_ctx.row_word("q", 0), (np.uint32(km_rc["mu32"]),)
                    )
                else:
                    cw = {
                        "k": km_rc["k"],
                        "mu": km_ctx.row_word("mu", 0),
                        "mu32": np.uint32(km_rc["mu32"]),
                        "r32": km_ctx.row_word("r32", 0),
                        "r32_shoup": km_ctx.row_word("r32_shoup", 0),
                    }
                    row = wordmod.W64.reduce_u64_any(row, km_ctx.row_word("q", 0), cw)
            bufs.append(row)
        # batch-NTT all decompose rows mod key_modulus: [L_t, 1, N]
        stacked = tuple(jnp.stack([b[l] for b in bufs])[:, None, :] for l in range(nl))
        from ..ops import ntt as nttmod

        ntt_bufs = nttmod.forward_ntt(stacked, km_ctx.ntt_tables)
        # lazy double-width inner product with the key ciphertexts
        for comp in range(n_components):
            acc = None
            for j in range(L_t):
                buf = tuple(a[j, 0] for a in ntt_bufs)
                key_poly = ksk.ciphertexts[j].polys[comp]
                kw = tuple(key_poly.data[l, key_row] for l in range(nl))
                if nl == 1:
                    term = limb.mul32(buf[0], kw[0])
                    acc = term if acc is None else limb.add64(acc, term)
                else:
                    term = limb.mul64(buf, kw)
                    acc = term if acc is None else limb.add128(acc, term)
            if nl == 1:
                cw = {
                    "mu32": np.uint32(km_rc["mu32"]),
                    "r32": km_ctx.row_word("r32", 0),
                    "r32_shoup": km_ctx.row_word("r32_shoup", 0),
                }
                red = wordmod.W32.reduce_u64(acc[0], acc[1], km_ctx.row_word("q", 0), cw)
            else:
                cw = {
                    "k": km_rc["k"],
                    "mu": km_ctx.row_word("mu", 0),
                    "mu32": np.uint32(km_rc["mu32"]),
                    "r32": km_ctx.row_word("r32", 0),
                    "r32_shoup": km_ctx.row_word("r32_shoup", 0),
                }
                red = wordmod.W64.reduce_u128(acc, km_ctx.row_word("q", 0), cw)
            out_rows[comp].append(red)
    # assemble Eval polys over the KS context, inverse NTT, drop q_ks
    updates = []
    for comp in range(n_components):
        w = polymod._stack_rows(out_rows[comp])
        p = PolyRq.from_word(w, ks_ctx, EVAL)
        p = polymod.inverse_ntt(p)
        p = polymod.divide_and_round_q_last(p)
        updates.append(p)
    return updates


_compute_key_switching_update_jit = jax.jit(
    _compute_key_switching_update, static_argnums=0
)

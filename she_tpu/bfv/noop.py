"""NoOpScheme: identity "encryption" for testing generic plumbing cheaply.

Reference: Sources/HomomorphicEncryption/NoOpScheme.swift:31-368. Ciphertexts
wrap the plaintext polynomial (mod t) directly; all homomorphic ops reduce to
plain mod-t polynomial arithmetic. Useful for exercising application layers
(PIR / PNNS protocol flow) without cryptographic cost.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import errors
from ..core import poly as polymod
from ..core.poly import COEFF, EVAL, PolyRq
from ..ops import galois as galoismod
from . import bfv as bfvmod

FRESH_CIPHERTEXT_POLY_COUNT = 1
MIN_NOISE_BUDGET = float("-inf")


@dataclass
class NoOpCiphertext:
    context: bfvmod.BfvContext
    poly: PolyRq  # over plaintext context


def generate_secret_key(context, rng=None):
    return bfvmod.SecretKey(PolyRq.zero(context.plaintext_context, EVAL))


def encrypt(pt: bfvmod.Plaintext, secret_key=None) -> NoOpCiphertext:
    return NoOpCiphertext(pt.context, pt.poly)


def decrypt(ct: NoOpCiphertext, secret_key=None) -> bfvmod.Plaintext:
    return bfvmod.Plaintext(ct.context, ct.poly)


def ct_add(a: NoOpCiphertext, b: NoOpCiphertext) -> NoOpCiphertext:
    return NoOpCiphertext(a.context, polymod.add(a.poly, b.poly))


def ct_sub(a: NoOpCiphertext, b: NoOpCiphertext) -> NoOpCiphertext:
    return NoOpCiphertext(a.context, polymod.sub(a.poly, b.poly))


def ct_neg(a: NoOpCiphertext) -> NoOpCiphertext:
    return NoOpCiphertext(a.context, polymod.neg(a.poly))


def ct_add_pt(a: NoOpCiphertext, pt: bfvmod.Plaintext) -> NoOpCiphertext:
    return NoOpCiphertext(a.context, polymod.add(a.poly, pt.poly))


def ct_mul(a: NoOpCiphertext, b: NoOpCiphertext) -> NoOpCiphertext:
    """Negacyclic product mod t via the mod-t NTT (t must be NTT-friendly;
    falls back to schoolbook otherwise)."""
    ctx = a.poly.context
    if ctx.supports_ntt:
        ea = polymod.forward_ntt(a.poly)
        eb = polymod.forward_ntt(b.poly)
        return NoOpCiphertext(a.context, polymod.inverse_ntt(polymod.mul_eval(ea, eb)))
    t = ctx.moduli[0]
    av = a.poly.to_values()[0]
    bv = b.poly.to_values()[0]
    n = ctx.degree
    out = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = i + j
            sign = 1
            if k >= n:
                k -= n
                sign = -1
            out[k] = (out[k] + sign * int(av[i]) * int(bv[j])) % t
    return NoOpCiphertext(
        a.context, PolyRq.from_values(out[None, :], ctx, COEFF)
    )


def apply_galois(ct: NoOpCiphertext, element: int, evaluation_key=None) -> NoOpCiphertext:
    import jax.numpy as jnp
    from ..ops import word as wordmod

    ctx = ct.poly.context
    qw = wordmod.as_word(jnp.asarray(ctx.q_arr))
    out = galoismod.apply_galois_coeff(ct.poly.word(), qw, element, ctx.word)
    return NoOpCiphertext(ct.context, PolyRq.from_word(out, ctx, COEFF))


def noise_budget(ct: NoOpCiphertext, secret_key=None) -> float:
    return float("inf")

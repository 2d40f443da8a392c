"""PolyContext: per-(degree, moduli) precomputation chain.

Mirrors the reference's PolyContext linked list dropping the last modulus
(Sources/HomomorphicEncryption/PolyRq/PolyContext.swift:19-267): each level
caches modular-reduction constants, NTT twiddle tables, and q_last^{-1}
mod q_i for modulus switching. All precomputation runs host-side with
Python big ints; device ops consume packed uint32 limb constants closed
over as jit constants.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .. import errors
from ..ops import ntt as nttmod
from ..ops import word as wordmod
from ..ops.word import W32, W64
from ..utils import nt


@lru_cache(maxsize=None)
def get_poly_context(
    degree: int, moduli: tuple[int, ...], scalar_bits: int
) -> "PolyContext":
    return PolyContext(degree, moduli, scalar_bits)


class PolyContext:
    """Immutable; use get_poly_context for interning (identity-based eq)."""

    def __init__(self, degree: int, moduli: tuple[int, ...], scalar_bits: int):
        if not nt.is_power_of_two(degree):
            raise errors.InvalidDegree(str(degree))
        if not moduli:
            raise errors.InvalidModulus("empty moduli")
        limit = (1 << (scalar_bits - 2)) - 1
        for q in moduli:
            if not (1 < q <= limit):
                raise errors.InvalidModulus(str(q))
        self.degree = degree
        self.moduli = tuple(moduli)
        self.scalar_bits = scalar_bits
        self.nlimbs = 1 if scalar_bits == 32 else 2
        self.word = W32 if self.nlimbs == 1 else W64
        self.row_consts = [wordmod.row_consts(q, scalar_bits) for q in self.moduli]
        self.q_product = 1
        for q in self.moduli:
            self.q_product *= q
        self._dev_cache: dict = {}

    # -- chain ------------------------------------------------------------

    @property
    def next(self) -> "PolyContext | None":
        if len(self.moduli) == 1:
            return None
        return get_poly_context(self.degree, self.moduli[:-1], self.scalar_bits)

    def get_context(self, moduli_count: int) -> "PolyContext":
        """Context keeping the first `moduli_count` moduli
        (reference PolyContext.getContext, PolyContext.swift:229-239)."""
        if not 1 <= moduli_count <= len(self.moduli):
            raise errors.IncompatibleContexts(f"moduli_count {moduli_count}")
        if moduli_count == len(self.moduli):
            return self
        return get_poly_context(self.degree, self.moduli[:moduli_count], self.scalar_bits)

    @property
    def moduli_count(self) -> int:
        return len(self.moduli)

    def __repr__(self) -> str:  # pragma: no cover
        return f"PolyContext(N={self.degree}, L={len(self.moduli)}, bits={self.scalar_bits})"

    # -- tables -----------------------------------------------------------

    @property
    def ntt_tables(self) -> nttmod.NttTables:
        for q in self.moduli:
            if not nt.is_ntt_modulus(q, self.degree):
                raise errors.InvalidModulus(f"{q} is not NTT-friendly for N={self.degree}")
        return nttmod.build_ntt_tables(self.moduli, self.degree, self.nlimbs)

    @property
    def supports_ntt(self) -> bool:
        return all(nt.is_ntt_modulus(q, self.degree) for q in self.moduli)

    def max_lazy_product_accumulation_count(self) -> int:
        """How many q_i^2-sized products fit in the double-width accumulator
        (reference PolyContext.maxLazyProductAccumulationCount,
        PolyContext.swift:246-253)."""
        cap = 1 << (2 * self.scalar_bits)
        return min(cap // ((q - 1) ** 2 + 1) for q in self.moduli)

    # -- device constants --------------------------------------------------

    def const(self, name: str, builder=None) -> np.ndarray:
        """Cached packed uint32 constant array; builder() -> object ndarray."""
        if name not in self._dev_cache:
            self._dev_cache[name] = wordmod.pack(builder(), self.nlimbs)
        return self._dev_cache[name]

    @property
    def q_arr(self) -> np.ndarray:
        """[W, L, 1] moduli."""
        return self.const("q", lambda: np.array(self.moduli, dtype=object)[:, None])

    def mu_arr(self) -> np.ndarray:
        """[W, L, 1] Barrett mu (per-row; use with per-row static k)."""
        return self.const(
            "mu", lambda: np.array([c["mu"] for c in self.row_consts], dtype=object)[:, None]
        )

    def row_word(self, name: str, row: int):
        """Per-row scalar constant as a word of uint32 numpy scalars."""
        key = (name, row)
        if key not in self._dev_cache:
            v = self.row_consts[row][name]
            self._dev_cache[key] = tuple(
                np.uint32((v >> (32 * i)) & 0xFFFFFFFF) for i in range(self.nlimbs)
            )
        return self._dev_cache[key]

    def scalar_word(self, value: int):
        """Arbitrary host int -> word of uint32 scalars (not cached)."""
        return tuple(np.uint32((value >> (32 * i)) & 0xFFFFFFFF) for i in range(self.nlimbs))

    def rows_word(self, values) -> np.ndarray:
        """Per-row host ints [L] -> packed [W, L, 1] array."""
        return wordmod.pack(np.array(list(values), dtype=object)[:, None], self.nlimbs)

    # -- modulus switching constants --------------------------------------

    @property
    def inverse_q_last(self) -> list[dict]:
        """Per i < L-1: q_last^{-1} mod q_i with Shoup factor
        (reference PolyContext.inverseQLast, PolyContext.swift:96-111)."""
        if "inv_q_last" not in self._dev_cache:
            q_last = self.moduli[-1]
            out = []
            for q in self.moduli[:-1]:
                inv = nt.inverse_mod(q_last % q, q)
                out.append(
                    {"v": inv, "shoup": wordmod.shoup_const(inv, q, self.scalar_bits)}
                )
            self._dev_cache["inv_q_last"] = out
        return self._dev_cache["inv_q_last"]

    def q_remainder(self, modulus: int) -> int:
        """Product of this context's moduli mod `modulus`."""
        return self.q_product % modulus

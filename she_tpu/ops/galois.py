"""Galois automorphisms f(x) -> f(x^p) as precomputed gather permutations.

The index/sign maps are static per (degree, element) — ideal for TPU: the
coeff-domain map is a gather plus a sign-flip mask, the eval-domain map a
pure permutation of the bit-reversed evaluation order
(reference: Sources/HomomorphicEncryption/PolyRq/Galois.swift:18-165).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..utils import nt


def is_valid_galois_element(element: int, degree: int) -> bool:
    return (
        nt.is_power_of_two(degree)
        and element % 2 == 1
        and 1 < element < 2 * degree
    )


@lru_cache(maxsize=None)
def coeff_maps(degree: int, element: int) -> tuple[np.ndarray, np.ndarray]:
    """(source_index, negate) arrays such that out[j] = +-in[src[j]].

    The reference iterates input index i -> output index (i*p mod N) with
    negation when floor(i*p / N) is odd (GaloisCoeffIterator); we invert
    that into a gather map.
    """
    assert is_valid_galois_element(element, degree)
    src = np.zeros(degree, dtype=np.int32)
    neg = np.zeros(degree, dtype=bool)
    raw = 0
    for i in range(degree):
        out = raw & (degree - 1)
        src[out] = i
        neg[out] = (raw >> nt.log2_exact(degree)) & 1 != 0
        raw += element
    return src, neg


@lru_cache(maxsize=None)
def eval_map(degree: int, element: int) -> np.ndarray:
    """Permutation `perm` with out[j] = in[perm[j]] in Eval order
    (GaloisEvalIterator, Galois.swift:65-99)."""
    assert is_valid_galois_element(element, degree)
    log2n = nt.log2_exact(degree)
    perm = np.zeros(degree, dtype=np.int32)
    for i in range(degree):
        reversed_idx = nt.reverse_bits(i + degree, log2n + 1)
        index_raw = ((element * reversed_idx) >> 1) & (degree - 1)
        perm[i] = nt.reverse_bits(index_raw, log2n)
    return perm


def apply_galois_coeff(data, q_word, element: int, word_cls):
    """data: word of [..., L, N] in Coeff; returns permuted+negated word."""
    degree = data[0].shape[-1]
    src, neg = coeff_maps(degree, element)
    src_j = jnp.asarray(src)
    neg_j = jnp.asarray(neg)
    gathered = tuple(jnp.take(a, src_j, axis=-1) for a in data)
    negated = word_cls.neg_mod(gathered, q_word)
    return tuple(jnp.where(neg_j, n, g) for n, g in zip(negated, gathered))


def apply_galois_eval(data, element: int):
    """data: word of [..., L, N] in Eval; pure permutation."""
    degree = data[0].shape[-1]
    perm = jnp.asarray(eval_map(degree, element))
    return tuple(jnp.take(a, perm, axis=-1) for a in data)


# -- element derivation (Galois.swift:169-319) ------------------------------


def swapping_rows_element(degree: int) -> int:
    return 2 * degree - 1


def rotating_columns_element(step: int, degree: int) -> int:
    """Galois element rotating SIMD columns by `step` (negative = left)."""
    assert nt.is_power_of_two(degree)
    positive = abs(step)
    if not 0 < positive < degree // 2:
        raise ValueError(f"invalid rotation step {step} for degree {degree}")
    if step > 0:
        positive = degree // 2 - positive
    return pow(3, positive, 2 * degree)


def rotating_columns_multi_step_elements(degree: int) -> list[int]:
    out = []
    log_max = nt.log2_exact(degree // 2)
    for log_step in range(log_max):
        step = 1 << log_step
        out.append(rotating_columns_element(step, degree))
        out.append(rotating_columns_element(-step, degree))
    return out


def steps_for(elements: list[int], degree: int) -> dict[int, int | None]:
    """Map Galois elements back to rotation steps (Galois.swift:239-258)."""
    result: dict[int, int | None] = {e: None for e in elements}
    found = 0
    g_pow = 1
    for step in range(degree // 2 + 1):
        if g_pow in result and result[g_pow] is None:
            result[g_pow] = degree // 2 - step
            found += 1
            if found == len(set(elements)):
                return result
        g_pow = (g_pow * 3) % (2 * degree)
    return result


def plan_multi_step(supported_steps: list[int], step: int, degree: int):
    """Greedy decomposition of a rotation into supported steps
    (Galois.swift:272-319); returns {step: count} or None."""
    if abs(step) >= degree:
        raise ValueError(f"invalid step {step}")
    if step in supported_steps:
        return {step: 1}

    def trunc_div(a, b):
        """Swift-style truncating division/remainder."""
        q = abs(a) // abs(b)
        if (a < 0) != (b < 0):
            q = -q
        return q, a - q * b

    def greedy(sorted_steps, transform):
        result: dict[int, int] = {}
        remaining = transform(step)
        for s in sorted_steps:
            ts = transform(s)
            if ts == 0:
                continue
            cnt, remaining = trunc_div(remaining, ts)
            if cnt > 0:
                result[s] = result.get(s, 0) + cnt
        return result if remaining == 0 else None

    sorted_desc = sorted(supported_steps, reverse=True)
    columns = degree >> 1
    pos = greedy(sorted_desc, lambda s: s)
    negt = greedy(list(reversed(sorted_desc)), lambda s: columns - s)
    if pos is None:
        return negt
    if negt is None:
        return pos
    return pos if sum(pos.values()) <= sum(negt.values()) else negt

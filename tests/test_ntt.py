"""Device NTT tests: reference KATs (bit-exact) + big-int cross-checks.

KAT vectors: Tests/HomomorphicEncryptionTests/NttTests.swift:72-240.
"""

import numpy as np
import pytest

from she_tpu.ops import ntt, word
from she_tpu.utils import refimpl


def run_device_ntt(coeff_rows, moduli, nlimbs):
    """coeff_rows: list of per-modulus coefficient lists."""
    degree = len(coeff_rows[0])
    tables = ntt.build_ntt_tables(tuple(moduli), degree, nlimbs)
    data = np.array(coeff_rows, dtype=object)
    x = word.as_word(word.pack(data, nlimbs))
    ev = ntt.forward_ntt(x, tables)
    ev_np = word.unpack(np.stack([np.asarray(a) for a in ev]))
    back = ntt.inverse_ntt(tuple(np.asarray(a) for a in ev), tables)
    back_np = word.unpack(np.stack([np.asarray(a) for a in back]))
    return ev_np, back_np


KATS = [
    # (moduli, coeff rows, eval rows)
    ([97], [[0, 0]], [[0, 0]]),
    ([97], [[1, 0]], [[1, 1]]),
    ([97], [[1, 2]], [[45, 54]]),
    ([113], [[3, 4]], [[63, 56]]),
    ([97, 113], [[1, 2], [3, 4]], [[45, 54], [63, 56]]),
    ([97], [[1, 2, 3, 4]], [[30, 7, 64, 0]]),
    (
        [97, 113],
        [[1, 2, 3, 4], [5, 6, 7, 8]],
        [[30, 7, 64, 0], [108, 31, 103, 4]],
    ),
    (
        [4194353],
        [[1, 2, 3, 4, 5, 6, 7, 8]],
        [[3372683, 765982, 387853, 2657954, 2013665, 1280882, 2457874, 3840527]],
    ),
    (
        [4194353, 113],
        [[1, 2, 3, 4, 5, 6, 7, 8], [1, 0, 0, 0, 0, 0, 0, 0]],
        [
            [3372683, 765982, 387853, 2657954, 2013665, 1280882, 2457874, 3840527],
            [1, 1, 1, 1, 1, 1, 1, 1],
        ],
    ),
    (
        [536870849],
        [[477051601, 421524611, 456257859, 247136825, 128775020, 76785070, 49764016,
          525812772, 325605371, 88935943, 255470762, 39507048, 404978219, 379383003,
          244420585, 346826612]],
        [[230846094, 480599401, 157364576, 360442736, 531052463, 294311347, 432899854,
          219721533, 286807067, 260650843, 362842688, 315862017, 493042020, 520739674,
          167758416, 370401491]],
    ),
    (
        [769],
        [[401, 203, 221, 352, 487, 151, 405, 356, 343, 424, 635, 757, 457, 280, 624,
          353, 496, 353, 624, 280, 457, 757, 635, 424, 343, 356, 405, 151, 487, 352,
          221, 203]],
        [list(range(1, 33))],
    ),
]


@pytest.mark.parametrize("nlimbs", [1, 2])
@pytest.mark.parametrize("kat_idx", range(len(KATS)))
def test_ntt_kats(kat_idx, nlimbs):
    moduli, coeff, ev = KATS[kat_idx]
    got_ev, got_back = run_device_ntt(coeff, moduli, nlimbs)
    assert (got_ev == np.array(ev, dtype=object)).all(), got_ev
    assert (got_back == np.array(coeff, dtype=object)).all()


def test_ntt_onehot_4096():
    moduli = [557057]
    coeff = [[1] + [0] * 4095]
    got_ev, got_back = run_device_ntt(coeff, moduli, 2)
    assert (got_ev == 1).all()
    assert (got_back == np.array(coeff, dtype=object)).all()


@pytest.mark.parametrize(
    "moduli,nlimbs,degree",
    [
        ([(1 << 28) - 65535, (1 << 27) - 40959], 1, 256),
        ([(1 << 55) - 311295, (1 << 60) - 16383], 2, 256),
        ([(1 << 29) - 180223, (1 << 60) - 16383], 2, 128),
    ],
)
def test_ntt_roundtrip_vs_host(moduli, nlimbs, degree):
    rng = np.random.default_rng(7)
    rows = [[int(rng.integers(0, min(q, 1 << 62))) % q for _ in range(degree)] for q in moduli]
    got_ev, got_back = run_device_ntt(rows, moduli, nlimbs)
    for i, q in enumerate(moduli):
        expect = refimpl.forward_ntt(rows[i], q)
        assert list(got_ev[i]) == expect, f"row {i} modulus {q}"
        assert list(got_back[i]) == rows[i]


def test_ntt_batched():
    """Leading batch dims (e.g. ciphertext polys) transform independently."""
    q = (1 << 28) - 65535
    degree = 64
    rng = np.random.default_rng(3)
    batch = np.array(
        [[[int(rng.integers(0, q)) for _ in range(degree)]] for _ in range(3)], dtype=object
    )  # [3, 1, 64]
    tables = ntt.build_ntt_tables((q,), degree, 1)
    x = word.as_word(word.pack(batch, 1))
    ev = ntt.forward_ntt(x, tables)
    ev_np = word.unpack(np.stack([np.asarray(a) for a in ev]))
    for b in range(3):
        assert list(ev_np[b, 0]) == refimpl.forward_ntt(list(batch[b, 0]), q)

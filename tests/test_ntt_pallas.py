"""Fused Pallas NTT kernel vs the staged pure-JAX NTT (bit-exact).

Runs the Pallas kernel in interpreter mode on CPU (SHE_TPU_NTT_PALLAS=1);
on real TPU hardware the same code path compiles via Mosaic.
"""

import numpy as np
import pytest

from she_tpu.ops import ntt as nttmod
from she_tpu.ops import ntt_pallas
from she_tpu.ops import word as wordmod
from she_tpu.utils import refimpl

W32_MODULI = ((1 << 28) - 65535, (1 << 28) - 73727)
W64_MODULI = ((1 << 55) - 311295, (1 << 55) - 1392639)


def _random_rows(moduli, degree, batch, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.zeros((batch, len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[:, i, :] = rng.integers(0, q, size=(batch, degree)).astype(object)
    return rows


@pytest.mark.parametrize("moduli,nlimbs", [(W32_MODULI, 1), (W64_MODULI, 2)])
@pytest.mark.parametrize("degree", [256, 512])
def test_pallas_matches_staged(monkeypatch, moduli, nlimbs, degree):
    monkeypatch.setenv("SHE_TPU_NTT_PALLAS", "1")
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    assert ntt_pallas.use_pallas(tables)
    rows = _random_rows(moduli, degree, batch=3)
    x = wordmod.as_word(wordmod.pack(rows, nlimbs))

    fwd_fused = ntt_pallas.forward_ntt(x, tables)
    monkeypatch.setenv("SHE_TPU_NTT_PALLAS", "0")
    fwd_staged = nttmod.forward_ntt(x, tables)
    for a, b in zip(fwd_fused, fwd_staged):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # also check one row against the host big-int reference
    got = wordmod.unpack(np.stack([np.asarray(a) for a in fwd_fused])[:, 0, 0])
    expect = refimpl.forward_ntt([int(v) for v in rows[0, 0]], moduli[0])
    assert list(got) == expect

    inv_fused = ntt_pallas.inverse_ntt(fwd_fused, tables)
    inv_staged = nttmod.inverse_ntt(fwd_staged, tables)
    for a, b in zip(inv_fused, inv_staged):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    back = wordmod.unpack(np.stack([np.asarray(a) for a in inv_fused]))
    assert (back == rows).all()


def test_dispatch_off_by_default_on_cpu():
    tables = nttmod.build_ntt_tables(W32_MODULI, 256, 1)
    assert not ntt_pallas.use_pallas(tables)


def test_small_degree_falls_back(monkeypatch):
    monkeypatch.setenv("SHE_TPU_NTT_PALLAS", "1")
    tables = nttmod.build_ntt_tables(W32_MODULI, 128, 1)
    assert not ntt_pallas.use_pallas(tables)

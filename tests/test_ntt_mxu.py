"""MXU-matmul NTT (ops/ntt_mxu.py): bit-equality vs the staged NTT.

The MXU path composes the staged path's own butterfly stage matrices, so
outputs must be bit-identical for every shape and width (same values, same
reference output ordering; reference PolyRq+Ntt.swift:237-319)."""

import numpy as np
import jax.numpy as jnp
import pytest

from she_tpu.ops import ntt as nttmod
from she_tpu.ops import ntt_mxu
from she_tpu.ops import word as wordmod

W32_MODULI = ((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727)
W64_MODULI = ((1 << 55) - 311295, (1 << 55) - 1392639)


def _random_word(moduli, degree, nlimbs, batch=(), seed=0):
    rng = np.random.default_rng(seed)
    rows = np.zeros(batch + (len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[..., i, :] = rng.integers(0, q, size=batch + (degree,)).astype(object)
    return wordmod.as_word(jnp.asarray(wordmod.pack(rows, nlimbs)))


@pytest.mark.parametrize(
    "moduli,degree,nlimbs,batch",
    [
        (W32_MODULI, 128, 1, ()),
        (W32_MODULI, 256, 1, (2, 3)),  # odd leading batch dims
        (W32_MODULI[:1], 4096, 1, (2,)),
        ((1073738753,), 128, 1, ()),  # 30-bit w32 modulus -> D=5 digits
        (W64_MODULI, 256, 2, (2,)),
        (W64_MODULI, 8192, 2, ()),
    ],
)
def test_mxu_matches_staged(moduli, degree, nlimbs, batch):
    tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    mx = ntt_mxu.build_mxu_tables(moduli, degree, nlimbs)
    x = _random_word(moduli, degree, nlimbs, batch)
    ref_f = nttmod.forward_ntt(x, tabs)
    got_f = ntt_mxu.forward_ntt(x, mx)
    for a, b in zip(ref_f, got_f):
        assert (np.asarray(a) == np.asarray(b)).all()
    ref_i = nttmod.inverse_ntt(ref_f, tabs)
    got_i = ntt_mxu.inverse_ntt(got_f, mx)
    for a, b in zip(ref_i, got_i):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_dispatch_env(monkeypatch):
    """SHE_TPU_NTT_MXU=1 routes ops.ntt through the MXU kernels and the
    result stays bit-identical (full encrypt-shaped round trip)."""
    moduli, degree, nlimbs = W32_MODULI, 128, 1
    tabs = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    x = _random_word(moduli, degree, nlimbs, (2,), seed=7)
    plain = nttmod.forward_ntt(x, tabs)
    monkeypatch.setenv("SHE_TPU_NTT_MXU", "1")
    routed = nttmod.forward_ntt(x, tabs)
    for a, b in zip(plain, routed):
        assert (np.asarray(a) == np.asarray(b)).all()
    monkeypatch.setenv("SHE_TPU_NTT_MXU", "0")
    off = nttmod.forward_ntt(x, tabs)
    for a, b in zip(plain, off):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_supports_degree_guard():
    assert not ntt_mxu.supports(W32_MODULI, 64)
    assert ntt_mxu.supports(W32_MODULI, 128)
    assert not ntt_mxu.supports(W32_MODULI, 96)

"""Sharded-polynomial (N-axis) and sharded-limb (L-axis) NTT + sharded
ct*ct multiply: bit-equality vs the single-device path on the 8-device CPU
mesh at production shapes (VERDICT round-1 item #1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.core.context import get_poly_context
from she_tpu.core import poly as polymod
from she_tpu.ops import ntt as nttmod
from she_tpu.ops import word as wordmod
from she_tpu.parallel import mesh as meshmod
from she_tpu.parallel import sharded
from she_tpu.rng.ctr_drbg import nist_aes128_ctr


def _random_poly_data(moduli, degree, nlimbs, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.zeros((len(moduli), degree), dtype=object)
    for i, q in enumerate(moduli):
        rows[i] = rng.integers(0, q, size=degree).astype(object)
    return jnp.asarray(wordmod.pack(rows, nlimbs))


W32_MODULI = ((1 << 27) - 40959, (1 << 28) - 65535, (1 << 28) - 73727)
W64_MODULI = ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327)


@pytest.mark.parametrize(
    "moduli,degree,nlimbs,n_dev",
    [
        (W32_MODULI, 4096, 1, 8),
        (W32_MODULI, 4096, 1, 2),
        (W64_MODULI, 8192, 2, 8),
        (W32_MODULI, 64, 1, 8),
    ],
)
def test_sharded_n_ntt_bit_equal(moduli, degree, nlimbs, n_dev):
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    mesh = meshmod.make_mesh(n_dev, "n")
    sn = sharded.ShardedNtt(mesh, tables, "n")
    data = _random_poly_data(moduli, degree, nlimbs)

    plain_fwd = jnp.stack(nttmod.forward_ntt(wordmod.as_word(data), tables))
    shard_fwd = sn.forward(data)
    assert (np.asarray(shard_fwd) == np.asarray(plain_fwd)).all()

    plain_inv = jnp.stack(nttmod.inverse_ntt(wordmod.as_word(plain_fwd), tables))
    shard_inv = sn.inverse(shard_fwd)
    assert (np.asarray(shard_inv) == np.asarray(plain_inv)).all()
    # round trip back to the input
    assert (np.asarray(shard_inv) == np.asarray(data)).all()


def test_sharded_n_ntt_all_stages_cross_device():
    # N == mesh size * 2: every stage except the last is cross-device
    moduli = ((1 << 27) - 40959,)
    tables = nttmod.build_ntt_tables(moduli, 16, 1)
    mesh = meshmod.make_mesh(8, "n")
    sn = sharded.ShardedNtt(mesh, tables, "n")
    data = _random_poly_data(moduli, 16, 1, seed=3)
    plain = jnp.stack(nttmod.forward_ntt(wordmod.as_word(data), tables))
    assert (np.asarray(sn.forward(data)) == np.asarray(plain)).all()
    assert (np.asarray(sn.inverse(plain)) == np.asarray(data)).all()


@pytest.mark.parametrize("nlimbs,moduli,degree", [(1, W32_MODULI, 4096), (2, W64_MODULI, 8192)])
def test_limb_parallel_ntt_bit_equal(nlimbs, moduli, degree):
    tables = nttmod.build_ntt_tables(moduli, degree, nlimbs)
    mesh = meshmod.make_mesh(3, "limb")
    fwd, inv = sharded.limb_parallel_ntt_fns(mesh, tables, "limb")
    data = _random_poly_data(moduli, degree, nlimbs, seed=1)
    plain_fwd = jnp.stack(nttmod.forward_ntt(wordmod.as_word(data), tables))
    got = fwd(data)
    assert (np.asarray(got) == np.asarray(plain_fwd)).all()
    back = inv(got)
    assert (np.asarray(back) == np.asarray(data)).all()


def test_limb_axis_size_must_divide():
    tables = nttmod.build_ntt_tables(W32_MODULI, 64, 1)
    mesh = meshmod.make_mesh(2, "limb")
    with pytest.raises(Exception):
        sharded.limb_parallel_ntt_fns(mesh, tables, "limb")


@pytest.mark.parametrize(
    "name,bits,n_dev",
    [
        ("n_4096_logq_27_28_28_logt_5", 32, 8),
        ("insecure_n_8_logq_5x18_logt_5", 64, 4),
    ],
)
def test_sharded_ct_mul_bit_equal(name, bits, n_dev):
    """End-to-end sharded BEHZ multiply at production N, bit-equal to the
    single-device bfv.ct_mul (and decrypts to the product).

    The w64 case is gated: XLA:CPU's compile of the fused 2-limb BEHZ
    shard_map graph is pathological regardless of N (>25 min at N=512,
    >10 min even at N=8 on an 8-core host — the u128 limb arithmetic
    inside shard_map defeats its scheduler). Run with SHE_TPU_SLOW_TESTS=1
    to include it; the 2-limb carry math itself is covered by the
    non-sharded w64 serving and conformance tests."""
    import os

    if bits == 64 and os.environ.get("SHE_TPU_SLOW_TESTS") != "1":
        pytest.skip("w64 shard_map BEHZ compile is pathological on XLA:CPU "
                    "(set SHE_TPU_SLOW_TESTS=1 to run)")
    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    ep = paramsmod.from_predefined(name, scalar_bits=bits)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))
    t_mod = ctx.plaintext_modulus
    rng = np.random.default_rng(7)
    va = [int(v) for v in rng.integers(0, t_mod, size=ctx.degree)]
    vb = [int(v) for v in rng.integers(0, t_mod, size=ctx.degree)]
    ct_a = bfv.encrypt(bfv.encode(ctx, va), sk, err_rng=det(b"a"))
    ct_b = bfv.encrypt(bfv.encode(ctx, vb), sk, err_rng=det(b"b"))

    expect = bfv.ct_mul(ct_a, ct_b)
    mesh = meshmod.make_mesh(n_dev, "n")
    got = sharded.sharded_ct_mul(ct_a, ct_b, mesh)
    assert len(got.polys) == 3
    for pg, pe in zip(got.polys, expect.polys):
        assert (np.asarray(pg.data) == np.asarray(pe.data)).all()

    dec = bfv.decode(ctx, bfv.decrypt(got, sk))
    # coefficient encoding multiplies as a negacyclic convolution mod t
    full = np.convolve(np.array(va, dtype=np.int64), np.array(vb, dtype=np.int64))
    n = ctx.degree
    folded = full[:n].copy()
    folded[: len(full) - n] -= full[n:]
    want = [int(v) % t_mod for v in folded]
    assert dec == want

"""Secret-material zeroization lifecycle (reference Keys.swift:19-50,
Zeroization.swift:1-40, CUtil/zeroize.c:1-24)."""

import numpy as np
import pytest

from she_tpu.bfv import bfv
from she_tpu import params as paramsmod
from she_tpu.core.poly import EVAL, PolyRq
from she_tpu.rng.ctr_drbg import NistCtrDrbg, nist_aes128_ctr
from she_tpu.utils.zeroize import zeroize


def test_zeroize_bytearray_and_numpy():
    buf = bytearray(b"secret material here")
    zeroize(buf)
    assert buf == bytearray(len(buf))
    arr = np.arange(64, dtype=np.uint32) + 1
    zeroize(arr)
    assert not arr.any()


def test_drbg_zeroize_scrubs_state_and_refuses_reuse():
    rng = nist_aes128_ctr(bytes(range(32)))
    rng.random_bytes(100)
    assert any(rng.rng.key)  # key state is live
    assert any(rng._buf)
    rng.zeroize()
    assert rng.rng.key == bytearray(16)
    assert not any(rng._buf)
    assert rng.rng.v == 0
    with pytest.raises(AssertionError):
        rng.random_bytes(1)  # buffer exhausted -> generate() refuses


def test_drbg_bytearray_state_keeps_nist_vectors():
    # regression: the bytearray-backed key state must not change the stream
    a = NistCtrDrbg(bytes(range(32))).generate(64)
    b = NistCtrDrbg(bytes(range(32))).generate(64)
    assert a == b and any(a)


def test_secret_key_zeroize_deletes_device_buffer():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    with bfv.generate_secret_key(ctx, nist_aes128_ctr(b"\x01" * 32)) as sk:
        pt = bfv.encode(ctx, [1, 2, 3])
        ct = bfv.encrypt(pt, sk, err_rng=nist_aes128_ctr(b"\x02" * 32))
        assert bfv.decode(ctx, bfv.decrypt(ct, sk))[:3] == [1, 2, 3]
        data = sk.poly.data
    # context-manager exit zeroized: the device buffer is gone
    with pytest.raises(Exception):
        np.asarray(data)


def test_device_scrub_donates_and_zeros():
    # the scrub jit must (a) produce zeros and (b) consume (donate) the
    # input buffer so XLA writes the zeros over the original allocation.
    # XLA:CPU does not implement donation (the in-place HBM scrub is a
    # TPU/GPU behavior), so (b) is asserted only off-CPU.
    import jax
    import jax.numpy as jnp

    x = jnp.ones((2, 3, 8), dtype=jnp.uint32)
    y = bfv._device_scrub(x)
    assert not np.asarray(y).any()
    if jax.default_backend() != "cpu":
        with pytest.raises(Exception):
            np.asarray(x)  # donated input handle is invalidated


def test_secret_key_zeroize_scrubs_host_numpy():
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    host = np.ones(
        (1, len(ctx.secret_key_context.moduli), ctx.degree), dtype=np.uint32
    )
    sk = bfv.SecretKey(PolyRq(host, ctx.secret_key_context, EVAL))
    sk.zeroize()
    assert not host.any()

"""EncryptionParameters validation and predefined-set parity tests.

Mirrors Tests/HomomorphicEncryptionTests/EncryptionParametersTests.swift.
"""

import pytest

from she_tpu import errors, params


def test_all_predefined_sets_validate():
    for name in params.PREDEFINED_RLWE_PARAMETERS:
        ep = params.from_predefined(name)
        assert ep.poly_degree >= 8
        for q in ep.coefficient_moduli:
            assert q % (2 * ep.poly_degree) == 1


def test_predefined_exact_moduli():
    ep = params.from_predefined("n_4096_logq_27_28_28_logt_5")
    assert ep.plaintext_modulus == 17
    assert ep.coefficient_moduli == (134176769, 268369921, 268361729)
    ep = params.from_predefined("n_8192_logq_3x55_logt_24")
    assert ep.plaintext_modulus == 8404993
    assert ep.coefficient_moduli == (
        36028797018652673,
        36028797017571329,
        36028797017456641,
    )
    ep = params.from_predefined("insecure_n_8_logq_5x18_logt_5")
    assert ep.coefficient_moduli == (131249, 131297, 131441, 131489, 131617)


def test_scalar32_support_flags():
    assert params.predefined_supports_scalar32("n_4096_logq_27_28_28_logt_5")
    assert not params.predefined_supports_scalar32("n_8192_logq_3x55_logt_24")
    with pytest.raises(errors.InvalidEncryptionParameters):
        params.from_predefined("n_8192_logq_3x55_logt_24", scalar_bits=32)


def test_simd_support():
    # t = 40961 = 1 mod 8192 supports SIMD at N=4096
    assert params.from_predefined("n_4096_logq_27_28_28_logt_16").supports_simd_encoding
    # t = 17 is not 1 mod 8192
    assert not params.from_predefined("n_4096_logq_27_28_28_logt_5").supports_simd_encoding


def test_insecure_rejected():
    with pytest.raises(errors.InsecureEncryptionParameters):
        params.EncryptionParameters(
            poly_degree=1024,
            plaintext_modulus=40961,
            coefficient_moduli=(1152921504606830593,),  # 60 bits > 21-bit limit
            security_level=params.SecurityLevel.QUANTUM128,
        )


def test_non_ntt_modulus_rejected():
    with pytest.raises(errors.InvalidEncryptionParameters):
        params.EncryptionParameters(
            poly_degree=8,
            plaintext_modulus=17,
            coefficient_moduli=(101,),  # 101 % 16 != 1
            security_level=params.SecurityLevel.UNCHECKED,
        )


def test_bytes_per_plaintext():
    ep = params.from_predefined("n_4096_logq_27_28_28_logt_17")
    # floor(log2 65537) = 16 bits/coeff * 4096 / 8
    assert ep.bytes_per_plaintext == 4096 * 16 // 8


def test_security_table():
    assert params.max_log2_coefficient_modulus(4096, params.SecurityLevel.QUANTUM128) == 83
    assert params.max_log2_coefficient_modulus(32768, params.SecurityLevel.QUANTUM128) == 660
    with pytest.raises(errors.InvalidDegree):
        params.max_log2_coefficient_modulus(3000, params.SecurityLevel.QUANTUM128)

"""Serialization: fixed-width coefficient bit-packing, seeded ciphertexts,
LSB skipping, key serialization.

Wire-format compatible with the reference:
* CoefficientPacking: big-endian bitstream of (bitsPerCoeff - skipLSBs)-bit
  fields (Sources/HomomorphicEncryption/CoefficientPacking.swift:34-217).
* Poly vectors: little-endian uint16 poly count + per-RNS-row packed rows at
  ceil(log2 q_i) bits (Serialize.swift:20-100, PolyRq+Serialize.swift:64-100).
* Ciphertexts: .seeded(poly0, seed) for fresh 2-poly ciphertexts (the `a`
  polynomial re-expands from the 32-byte AES-CTR-DRBG seed) or
  .full(polys, skipLSBs, correctionFactor) (SerializedCiphertext.swift:22-160).

Packing runs on host with numpy bit ops (vectorized over coefficients).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .. import errors
from ..core import poly as polymod
from ..core.context import PolyContext
from ..core.poly import COEFF, EVAL, PolyRq
from ..rng import sampling
from ..rng.ctr_drbg import nist_aes128_ctr


def ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def floor_log2(x: int) -> int:
    return x.bit_length() - 1


# ---------------------------------------------------------------------------
# Coefficient packing
# ---------------------------------------------------------------------------


def coefficients_to_bytes_byte_count(coeff_count: int, bits_per_coeff: int, skip_lsbs: int = 0) -> int:
    serialized = bits_per_coeff - skip_lsbs
    return -(-(coeff_count * serialized) // 8)


def bytes_to_coefficients_coeff_count(byte_count: int, bits_per_coeff: int, decode: bool, skip_lsbs: int = 0) -> int:
    serialized = bits_per_coeff - skip_lsbs
    if decode:
        return 8 * byte_count // serialized
    return -(-(8 * byte_count) // serialized)


def _validate(bits_per_coeff: int, skip_lsbs: int):
    # <= 64: the vectorized packing paths below use uint64 shifts, which are
    # undefined for shift counts >= 64 (moduli are <= 62 bits, so any wider
    # request is a caller bug and must fail loudly).
    if not (0 < bits_per_coeff <= 64 and bits_per_coeff > skip_lsbs and skip_lsbs >= 0):
        raise errors.SerializationError(
            f"invalid packing bitsPerCoeff={bits_per_coeff} skipLSBs={skip_lsbs}"
        )


def coefficients_to_bytes(coeffs, bits_per_coeff: int, skip_lsbs: int = 0) -> bytes:
    """coeffs: array of ints -> MSB-first bitstream of truncated coeffs."""
    _validate(bits_per_coeff, skip_lsbs)
    sbc = bits_per_coeff - skip_lsbs
    # moduli are <= 62 bits, so coefficients always fit u64: extract the
    # MSB-first bit matrix with vectorized uint64 shifts (object-dtype
    # big-int shifts were ~50x slower and dominated ciphertext serialize).
    arr = np.asarray(coeffs, dtype=object).astype(np.uint64) >> np.uint64(skip_lsbs)
    n = len(arr)
    shifts = np.arange(sbc - 1, -1, -1, dtype=np.uint64)
    # bits[i, j] = j'th MSB of the serialized field of coeff i
    bits = ((arr[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    nbytes = coefficients_to_bytes_byte_count(n, bits_per_coeff, skip_lsbs)
    padded = np.zeros(nbytes * 8, dtype=np.uint8)
    padded[: len(flat)] = flat
    return np.packbits(padded).tobytes()


def bytes_to_coefficients(
    data: bytes, bits_per_coeff: int, decode: bool, skip_lsbs: int = 0, coeff_count: int | None = None
) -> np.ndarray:
    """Inverse of coefficients_to_bytes -> object array of ints."""
    _validate(bits_per_coeff, skip_lsbs)
    sbc = bits_per_coeff - skip_lsbs
    count = (
        coeff_count
        if coeff_count is not None
        else bytes_to_coefficients_coeff_count(len(data), bits_per_coeff, decode, skip_lsbs)
    )
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    need = count * sbc
    if len(bits) < need:
        bits = np.concatenate([bits, np.zeros(need - len(bits), dtype=np.uint8)])
    bits = bits[:need].reshape(count, sbc)
    weights = np.uint64(1) << np.arange(sbc - 1, -1, -1, dtype=np.uint64)
    out64 = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return (out64 << np.uint64(skip_lsbs)).astype(object)


# ---------------------------------------------------------------------------
# Poly (de)serialization
# ---------------------------------------------------------------------------


def poly_serialization_byte_count(context: PolyContext, skip_lsbs: int = 0) -> int:
    return sum(
        coefficients_to_bytes_byte_count(context.degree, ceil_log2(q), skip_lsbs)
        for q in context.moduli
    )


def serialize_poly(p: PolyRq, skip_lsbs: int = 0) -> bytes:
    vals = p.to_values()
    out = []
    for i, q in enumerate(p.context.moduli):
        out.append(coefficients_to_bytes(vals[i], ceil_log2(q), skip_lsbs))
    return b"".join(out)


def deserialize_poly(data: bytes, context: PolyContext, fmt: str, skip_lsbs: int = 0) -> PolyRq:
    vals = np.zeros((len(context.moduli), context.degree), dtype=object)
    offset = 0
    for i, q in enumerate(context.moduli):
        nb = coefficients_to_bytes_byte_count(context.degree, ceil_log2(q), skip_lsbs)
        if offset + nb > len(data):
            raise errors.SerializationError("buffer too short for poly")
        vals[i] = bytes_to_coefficients(
            data[offset : offset + nb], ceil_log2(q), decode=False,
            skip_lsbs=skip_lsbs, coeff_count=context.degree,
        )
        offset += nb
    return PolyRq.from_values(vals, context, fmt)


def serialize_polys(polys: list[PolyRq], skip_lsbs: list[int] | None = None) -> bytes:
    """uint16-LE poly count + packed polys (Serialize.swift:20-68)."""
    skip_lsbs = skip_lsbs or [0] * len(polys)
    out = [len(polys).to_bytes(2, "little")]
    for p, s in zip(polys, skip_lsbs):
        out.append(serialize_poly(p, s))
    return b"".join(out)


def deserialize_polys(
    data: bytes, context: PolyContext, fmt: str, skip_lsbs: list[int] | None = None
) -> list[PolyRq]:
    count = int.from_bytes(data[:2], "little")
    skip_lsbs = skip_lsbs or [0] * count
    offset = 2
    polys = []
    for i in range(count):
        nb = poly_serialization_byte_count(context, skip_lsbs[i])
        polys.append(deserialize_poly(data[offset : offset + nb], context, fmt, skip_lsbs[i]))
        offset += nb
    return polys


# ---------------------------------------------------------------------------
# Ciphertext (de)serialization
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SerializedCiphertext:
    """kind: 'seeded' (poly0+seed) or 'full' (polys+skipLSBs+correction)."""

    kind: str
    polys: bytes
    seed: bytes = b""
    skip_lsbs: tuple[int, ...] = ()
    correction_factor: int = 1


def skip_lsbs_for_decryption(ct) -> list[int]:
    """Per-poly LSB drop counts for decryption-only serialization
    (reference Bfv+Decrypt.swift:51-109, eprint 2022/207 Sec. 5.2 with
    corrections; z-score 8)."""
    if ct.moduli_count != 1:
        return [0] * len(ct.polys)
    params = ct.context.params
    q0 = params.coefficient_moduli[0]
    t = params.plaintext_modulus
    l_prime = floor_log2(q0 // t) - 3 if q0 >= 2 * t else 0
    poly0 = max(l_prime, 0)
    tmp = int(8.0 * math.sqrt(2.0 * params.poly_degree / 9.0))
    poly1 = l_prime - (0 if tmp == 0 else ceil_log2(tmp))
    if poly1 <= 1:
        poly0 = max(l_prime + 1, 0)
        poly1 = 0
    return [poly0, poly1]


def serialize_ciphertext(
    ct, for_decryption: bool = False, indices: list[int] | None = None
) -> SerializedCiphertext:
    """Seeded form when the fresh seed is retained; otherwise full form with
    optional LSB skipping / index masking (SerializedCiphertext.swift:76-160)."""
    from ..bfv import bfv as bfvmod

    if indices is not None:
        if ct.fmt != COEFF:
            raise errors.InvalidFormat("index masking requires Coeff")
        mask_vals = np.zeros((len(ct.polys[0].moduli), ct.polys[0].degree), dtype=object)
        vals = ct.polys[0].to_values()
        for idx in indices:
            if not 0 <= idx < ct.polys[0].degree:
                raise errors.SerializationError(f"invalid coefficient index {idx}")
            mask_vals[:, idx] = vals[:, idx]
        masked0 = PolyRq.from_values(mask_vals, ct.polys[0].context, COEFF)
        ct = bfvmod.Ciphertext(ct.context, [masked0] + ct.polys[1:], ct.correction_factor, ct.seed)

    if ct.seed and len(ct.polys) == 2:
        return SerializedCiphertext(
            kind="seeded", polys=serialize_poly(ct.polys[0]), seed=ct.seed
        )
    if for_decryption and ct.fmt == COEFF:
        skips = skip_lsbs_for_decryption(ct)
    else:
        skips = [0] * len(ct.polys)
    return SerializedCiphertext(
        kind="full",
        polys=serialize_polys(ct.polys, skips),
        skip_lsbs=tuple(skips),
        correction_factor=ct.correction_factor,
    )


def deserialize_ciphertext(
    serialized: SerializedCiphertext, context, fmt: str, moduli_count: int | None = None
):
    """fmt: format of the serialized polys ('coeff' or 'eval')."""
    from ..bfv import bfv as bfvmod

    c = moduli_count or len(context.ciphertext_context.moduli)
    poly_ctx = context.secret_key_context.get_context(c)
    if serialized.kind == "seeded":
        p0 = deserialize_poly(serialized.polys, poly_ctx, fmt)
        rng = nist_aes128_ctr(serialized.seed)
        a_vals = sampling.sample_uniform(rng, list(poly_ctx.moduli), poly_ctx.degree)
        a = PolyRq.from_values(a_vals, poly_ctx, EVAL)
        if fmt == COEFF:
            a = polymod.inverse_ntt(a)
        return bfvmod.Ciphertext(context, [p0, a], 1, serialized.seed)
    polys = deserialize_polys(
        serialized.polys, poly_ctx, fmt, list(serialized.skip_lsbs) or None
    )
    return bfvmod.Ciphertext(context, polys, serialized.correction_factor, None)


# ---------------------------------------------------------------------------
# Plaintext / key (de)serialization
# ---------------------------------------------------------------------------


def serialize_plaintext(pt) -> bytes:
    return serialize_poly(pt.poly)


def deserialize_plaintext(data: bytes, context, fmt: str = COEFF, moduli_count: int | None = None):
    from ..bfv import bfv as bfvmod

    if fmt == COEFF:
        poly_ctx = context.plaintext_context
    else:
        c = moduli_count or len(context.ciphertext_context.moduli)
        poly_ctx = context.ciphertext_context.get_context(c)
    return bfvmod.Plaintext(context, deserialize_poly(data, poly_ctx, fmt))


def serialize_secret_key(sk) -> bytes:
    return serialize_polys([sk.poly])


def deserialize_secret_key(data: bytes, context):
    from ..bfv import bfv as bfvmod

    polys = deserialize_polys(data, context.secret_key_context, EVAL)
    return bfvmod.SecretKey(polys[0])


def serialize_key_switch_key(ksk) -> list[SerializedCiphertext]:
    return [serialize_ciphertext(ct) for ct in ksk.ciphertexts]


def deserialize_key_switch_key(serialized: list[SerializedCiphertext], context):
    from ..bfv import keys as keysmod

    cts = [
        deserialize_ciphertext(
            s, context, EVAL, moduli_count=len(context.secret_key_context.moduli)
        )
        for s in serialized
    ]
    return keysmod.KeySwitchKey(cts)


def serialize_evaluation_key(ek) -> dict:
    out = {"galois": None, "relin": None}
    if ek.galois_key is not None:
        out["galois"] = {
            el: serialize_key_switch_key(k) for el, k in ek.galois_key.keys.items()
        }
    if ek.relinearization_key is not None:
        out["relin"] = serialize_key_switch_key(ek.relinearization_key.key_switch_key)
    return out


def deserialize_evaluation_key(serialized: dict, context):
    from ..bfv import keys as keysmod

    galois = None
    if serialized.get("galois"):
        galois = keysmod.GaloisKey(
            {
                el: deserialize_key_switch_key(v, context)
                for el, v in serialized["galois"].items()
            }
        )
    relin = None
    if serialized.get("relin"):
        relin = keysmod.RelinearizationKey(
            deserialize_key_switch_key(serialized["relin"], context)
        )
    return keysmod.EvaluationKey(galois, relin)

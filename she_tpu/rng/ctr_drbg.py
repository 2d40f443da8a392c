"""NIST SP 800-90A CTR_DRBG (AES-128, no derivation function).

Bit-exact reimplementation of the reference RNG so that seeded-ciphertext
seed expansion interoperates byte-for-byte
(reference: Sources/HomomorphicEncryption/Random/NistCtrDrbg.swift:25-110,
BufferedRng.swift:17-67, NistAes128Ctr.swift:17-40).

AES itself comes from the `cryptography` package (OpenSSL backend); CTR
mode there increments the full 16-byte counter big-endian, matching the
reference's swift-crypto AES._CTR usage.
"""

from __future__ import annotations

import os

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

_BLOCK = 16
_KEYLEN = 16
_SEEDLEN = _KEYLEN + _BLOCK  # 32
_MASK128 = (1 << 128) - 1


def _aes_ctr_keystream(key: bytes, counter: int, nbytes: int) -> bytes:
    """AES-128-CTR keystream of nbytes, counter as 128-bit big-endian."""
    nonce = (counter & _MASK128).to_bytes(16, "big")
    enc = Cipher(algorithms.AES(key), modes.CTR(nonce)).encryptor()
    return enc.update(b"\x00" * nbytes) + enc.finalize()


class NistCtrDrbg:
    """CTR_DRBG state machine (key, V, reseed counter).

    The reference keeps `nonce` = V and always encrypts with counter V+1
    (NistCtrDrbg.swift:45-50), then advances V by the number of blocks.
    """

    RESEED_INTERVAL = 1 << 48
    MAX_BYTES_PER_REQUEST = 1 << 16

    def __init__(self, entropy: bytes | None = None):
        if entropy is None:
            entropy = os.urandom(_SEEDLEN)
        if len(entropy) != _SEEDLEN:
            raise ValueError(f"entropy must be {_SEEDLEN} bytes")
        # Key state lives in a bytearray so zeroize() can scrub it in place
        # (reference zeroizes DRBG state on deinit, Zeroization.swift:1-40).
        self.key = bytearray(_KEYLEN)
        self.v = 0
        self.reseed_counter = 1
        self._update(entropy)

    def _update(self, provided: bytes) -> None:
        assert len(provided) == _SEEDLEN
        stream = _aes_ctr_keystream(bytes(self.key), (self.v + 1) & _MASK128, _SEEDLEN)
        for i in range(_KEYLEN):
            self.key[i] = stream[i] ^ provided[i]
        self.v = int.from_bytes(
            bytes(a ^ b for a, b in zip(stream[_KEYLEN:], provided[_KEYLEN:])), "big"
        )

    def generate(self, count: int) -> bytes:
        assert self.reseed_counter <= self.RESEED_INTERVAL
        assert count <= self.MAX_BYTES_PER_REQUEST
        out = _aes_ctr_keystream(bytes(self.key), (self.v + 1) & _MASK128, count)
        self.v = (self.v + (count + _BLOCK - 1) // _BLOCK) & _MASK128
        self._update(b"\x00" * _SEEDLEN)
        self.reseed_counter += 1
        return out

    def zeroize(self) -> None:
        """Scrub the DRBG key state (reference Keys.swift:19-50 lifecycle)."""
        from ..utils.zeroize import zeroize

        zeroize(self.key)
        self.v = 0
        self.reseed_counter = self.RESEED_INTERVAL + 1  # refuse further use


class BufferedRng:
    """4096-byte buffered stream over a generator, matching BufferedRng.swift.

    Because each `generate` call mutates DRBG state, the buffering pattern
    is part of the byte-stream contract: consumers see the concatenation of
    successive generate(4096) outputs.
    """

    BUFFER_BYTES = 4096

    def __init__(self, rng: NistCtrDrbg):
        self.rng = rng
        self._buf = bytearray()
        self._off = 0

    def random_bytes(self, n: int) -> bytes:
        chunks = []
        need = n
        while need > 0:
            if self._off == len(self._buf):
                self._buf = bytearray(self.rng.generate(self.BUFFER_BYTES))
                self._off = 0
            take = min(need, len(self._buf) - self._off)
            chunks.append(self._buf[self._off : self._off + take])
            self._off += take
            need -= take
        return b"".join(chunks)

    def next_u64(self) -> int:
        return int.from_bytes(self.random_bytes(8), "little")

    def next_u32(self) -> int:
        return int.from_bytes(self.random_bytes(4), "little")

    def zeroize(self) -> None:
        """Scrub the buffered keystream and the underlying DRBG state."""
        from ..utils.zeroize import zeroize

        if self._buf:
            zeroize(self._buf)
        self._off = len(self._buf)
        self.rng.zeroize()


def nist_aes128_ctr(seed: bytes) -> BufferedRng:
    """The reference's NistAes128Ctr = BufferedRng<NistCtrDrbg> with 4096-byte buffer."""
    return BufferedRng(NistCtrDrbg(seed))


class SystemRng:
    """os.urandom-backed RNG with the same interface (non-reproducible)."""

    def random_bytes(self, n: int) -> bytes:
        return os.urandom(n)

    def next_u64(self) -> int:
        return int.from_bytes(os.urandom(8), "little")

    def next_u32(self) -> int:
        return int.from_bytes(os.urandom(4), "little")

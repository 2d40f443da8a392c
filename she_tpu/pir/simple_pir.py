"""SimplePIR: LWE-based PIR with client-side precomputation.

Reference: Sources/PrivateInformationRetrieval/SimplePir/*.swift. The
database is a Z_p matrix; the hint D*A is precomputed offline; queries are
LWE encryptions of a one-hot column selector; the client precomputes query
material using RLWE-accelerated noiseless samples (negacyclic matrix A
expanded from seeded polynomials, A*s computed as polynomial products).

Moduli: ciphertext modulus 2^b (power of two, wrapping uint64 arithmetic),
NTT-friendly modulus q' = smallest (b+1)-bit NTT prime used for the
polynomial sampling path, with divide-and-round mod switching q' -> 2^b.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

from .. import errors
from .. import params as paramsmod
from ..core import poly as polymod
from ..core.context import get_poly_context
from ..core.poly import COEFF, EVAL, PolyRq
from ..io import serialize as ser
from ..rng import sampling
from ..rng.ctr_drbg import SystemRng, nist_aes128_ctr
from ..utils import nt


@dataclass(frozen=True)
class SimplePirEncryptionParams:
    """SimplePir.swift:19-92."""

    plaintext_modulus_bits: int
    ciphertext_modulus_bits: int
    lattice_dimension: int
    error_std_dev: float = 3.2
    security_level: paramsmod.SecurityLevel = paramsmod.SecurityLevel.QUANTUM128

    def __post_init__(self):
        if not nt.is_power_of_two(self.lattice_dimension):
            raise errors.HeError("lattice dimension must be a power of two")
        if self.ciphertext_modulus_bits <= self.plaintext_modulus_bits:
            raise errors.HeError("ciphertext modulus must exceed plaintext modulus")
        allowed = paramsmod.max_log2_coefficient_modulus(
            self.lattice_dimension, self.security_level
        )
        if self.ciphertext_modulus_bits > allowed:
            raise errors.InsecureEncryptionParameters(
                f"{self.ciphertext_modulus_bits} bits > {allowed} for n={self.lattice_dimension}"
            )

    @property
    def ciphertext_mask(self) -> int:
        return (1 << self.ciphertext_modulus_bits) - 1

    @property
    def delta(self) -> int:
        return 1 << (self.ciphertext_modulus_bits - self.plaintext_modulus_bits)


@dataclass(frozen=True)
class SimplePirParameters:
    """SimplePir.swift:95-166."""

    encryption_params: SimplePirEncryptionParams
    entry_size_in_bytes: int
    entries_per_column: int
    chunks_per_entry: int
    database_columns: int
    seed: bytes

    def __post_init__(self):
        assert self.entries_per_column == 1 or self.chunks_per_entry == 1

    @property
    def entry_size_in_scalar(self) -> int:
        return ser.bytes_to_coefficients_coeff_count(
            self.entry_size_in_bytes, self.encryption_params.plaintext_modulus_bits, decode=False
        )

    @property
    def chunk_size(self) -> int:
        return -(-self.entry_size_in_scalar // self.chunks_per_entry)

    @property
    def column_size(self) -> int:
        if self.chunks_per_entry == 1:
            return self.entries_per_column * self.entry_size_in_scalar
        return self.chunk_size

    @property
    def a_poly_count(self) -> int:
        return -(-self.database_columns // self.encryption_params.lattice_dimension)


def computing_params(
    encryption_params: SimplePirEncryptionParams,
    entry_count: int,
    entry_size_in_bytes: int,
    seed: bytes | None = None,
) -> SimplePirParameters:
    """Square-ish database shaping (SimplePir+Database.swift:208-245)."""
    entry_size_in_scalar = ser.bytes_to_coefficients_coeff_count(
        entry_size_in_bytes, encryption_params.plaintext_modulus_bits, decode=False
    )
    database_size = entry_count * entry_size_in_scalar
    ideal_column = int(round(math.sqrt(database_size)))
    if ideal_column > entry_size_in_scalar:
        ideal_column = entry_size_in_scalar
    entries_per_column = max(int(round(ideal_column / entry_size_in_scalar)), 1)
    chunks_per_entry = max(int(entry_size_in_scalar / round(ideal_column)), 1)
    if entries_per_column == 1:
        database_columns = entry_count * chunks_per_entry
    else:
        database_columns = max(-(-entry_count // entries_per_column), 1)
    return SimplePirParameters(
        encryption_params=encryption_params,
        entry_size_in_bytes=entry_size_in_bytes,
        entries_per_column=entries_per_column,
        chunks_per_entry=chunks_per_entry,
        database_columns=database_columns,
        seed=seed if seed is not None else os.urandom(32),
    )


class SimplePirContext:
    """SimplePirContext.swift:19-93."""

    def __init__(self, params: SimplePirParameters):
        self.params = params
        ep = params.encryption_params
        b = ep.ciphertext_modulus_bits
        self.ntt_friendly_mod = nt.generate_primes(
            [b + 1], preferring_small=True, ntt_degree=ep.lattice_dimension
        )[0]
        self.regular_mod = 1 << b
        self.mask = ep.ciphertext_mask
        self.delta = ep.delta
        bits = 32 if self.ntt_friendly_mod < (1 << 30) else 64
        self.extra_context = get_poly_context(
            ep.lattice_dimension, (self.ntt_friendly_mod,), bits
        )

    def generate_a_polynomials(self) -> list[PolyRq]:
        rng = nist_aes128_ctr(self.params.seed)
        out = []
        for _ in range(self.params.a_poly_count):
            vals = sampling.sample_uniform(
                rng, list(self.extra_context.moduli), self.extra_context.degree
            )
            out.append(PolyRq.from_values(vals, self.extra_context, COEFF))
        return out

    def materialize_a_matrix(self, a_polys: list[PolyRq]) -> np.ndarray:
        """A[j, k] = coeff j%N of x^k * p_{j//N} (SimplePir+Database.swift:186-205)."""
        n = self.extra_context.degree
        cols = self.params.database_columns
        blocks = []
        for p in a_polys:
            coeffs = p.to_values()[0]  # [N]
            # M[i] = coeffs of x^i * p; block = M^T => block[r, c] = (x^c p)[r]
            block = np.zeros((n, n), dtype=object)
            for c in range(n):
                shifted = np.roll(coeffs, c).copy()
                if c > 0:
                    shifted[:c] = [(-int(v)) % self.ntt_friendly_mod for v in shifted[:c]]
                block[:, c] = shifted
            blocks.append(block)
        full = np.concatenate(blocks, axis=0)[:cols]
        return full

    def mod_switch(self, matrix: np.ndarray) -> np.ndarray:
        """divide-and-round q' -> 2^b (Array2d.divideAndRound)."""
        q = self.ntt_friendly_mod
        new = self.regular_mod
        return ((matrix * new + (q >> 1)) // q) % new

    def generate_secret_polys(self, rng=None) -> list[PolyRq]:
        rng = rng or SystemRng()
        out = []
        for _ in range(self.params.chunks_per_entry):
            vals = sampling.sample_ternary(
                rng, list(self.extra_context.moduli), self.extra_context.degree
            )
            out.append(PolyRq.from_values(vals, self.extra_context, COEFF))
        return out

    def noiseless_sample(self, a_polys_eval: list[PolyRq], secret_polys: list[PolyRq]) -> np.ndarray:
        """A*s via negacyclic polynomial products (SimplePir+Client.swift:20-50)."""
        cols = self.params.database_columns
        rows = []
        for s in secret_polys:
            s_eval = polymod.forward_ntt(s)
            coeffs = []
            for a in a_polys_eval:
                prod = polymod.inverse_ntt(polymod.mul_eval(a, s_eval))
                coeffs.extend(prod.to_values()[0])
            rows.append(coeffs[:cols])
        return np.array(rows, dtype=object)

    def encrypt_zero(self, a_polys_eval, secret_polys, rng=None) -> np.ndarray:
        """(A*s mod-switched) + CBD error, masked (SimplePir+Client.swift:55-80)."""
        rng = rng or SystemRng()
        sample = self.mod_switch(self.noiseless_sample(a_polys_eval, secret_polys))
        err = sampling.sample_centered_binomial(
            rng,
            [self.regular_mod],
            self.params.database_columns * self.params.chunks_per_entry,
            self.params.encryption_params.error_std_dev,
        )[0].reshape(self.params.chunks_per_entry, self.params.database_columns)
        return (sample + err) % self.regular_mod

    def extract_entries(self, data: np.ndarray, index: int) -> np.ndarray:
        """[chunks, columnSize] -> [chunks, chunkSize] for an entry index."""
        p = self.params
        out = []
        for qi in range(p.chunks_per_entry):
            entry_index = index * p.chunks_per_entry + qi
            in_col = entry_index % p.entries_per_column
            start = in_col * p.chunk_size
            out.append(data[qi, start : start + p.chunk_size])
        return np.array(out, dtype=object)


# ---------------------------------------------------------------------------
# Database processing
# ---------------------------------------------------------------------------


@dataclass
class SimplePirProcessResults:
    database: np.ndarray  # [columnSize, databaseColumns] mod 2^p entries
    hint: np.ndarray  # [columnSize, latticeDimension] mod q'
    params: SimplePirParameters


def process_database(
    entries: list[bytes],
    encryption_params: SimplePirEncryptionParams,
    seed: bytes | None = None,
) -> SimplePirProcessResults:
    """SimplePir+Database.swift:247-291."""
    entry_size = max((len(e) for e in entries), default=0)
    params = computing_params(encryption_params, len(entries), entry_size, seed)
    p_bits = encryption_params.plaintext_modulus_bits
    padded_entry = (
        params.entry_size_in_scalar
        if params.chunks_per_entry == 1
        else -(-params.entry_size_in_scalar // params.chunks_per_entry) * params.chunks_per_entry
    )
    column_size = padded_entry * params.entries_per_column // params.chunks_per_entry
    flat = np.zeros(params.database_columns * column_size, dtype=object)
    for i, entry in enumerate(entries):
        e = bytes(entry) + b"\x00" * (entry_size - len(entry))
        coeffs = ser.bytes_to_coefficients(e, p_bits, decode=False, coeff_count=params.entry_size_in_scalar)
        flat[i * padded_entry : i * padded_entry + params.entry_size_in_scalar] = coeffs
    db = flat.reshape(params.database_columns, column_size).T.copy()  # [columnSize, cols]
    ctx = SimplePirContext(params)
    a_matrix = ctx.materialize_a_matrix(ctx.generate_a_polynomials())
    hint = (db @ a_matrix) % ctx.ntt_friendly_mod
    return SimplePirProcessResults(db, hint, params)


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class SimplePirServer:
    def __init__(self, database: np.ndarray, hint: np.ndarray, params: SimplePirParameters):
        self.database = database
        self.hint = hint
        self.params = params

    def compute_response(self, requests: np.ndarray) -> np.ndarray:
        """D @ requests^T mod 2^b, transposed (SimplePir+Server.swift:20-39).
        requests: [chunksPerEntry, databaseColumns]."""
        mask = self.params.encryption_params.ciphertext_mask
        result = (self.database @ requests.T) & mask  # [columnSize, chunks]
        return result.T


# ---------------------------------------------------------------------------
# Client (precomputed query pipeline, SimplePir+Precompute.swift:191-315)
# ---------------------------------------------------------------------------


@dataclass
class PrecomputedQueryWithoutIndices:
    context: SimplePirContext
    queries_without_indices: np.ndarray  # [chunks, cols] mod 2^b
    results_without_response: np.ndarray  # [chunks, columnSize] mod q'

    def add(self, index: int) -> "PrecomputedQueryWithIndices":
        p = self.context.params
        queries = self.queries_without_indices.copy()
        for qi in range(p.chunks_per_entry):
            entry_index = index * p.chunks_per_entry + qi
            col = entry_index // p.entries_per_column
            queries[qi, col] = (queries[qi, col] + self.context.delta) & self.context.mask
        return PrecomputedQueryWithIndices(self.context, queries, self.results_without_response, index)


@dataclass
class PrecomputedQueryWithIndices:
    context: SimplePirContext
    queries: np.ndarray
    results_without_response: np.ndarray
    index: int

    def prepare_response(self) -> "PreparedResponse":
        return PreparedResponse(
            self.context,
            self.context.extract_entries(self.results_without_response, self.index),
        )


@dataclass
class PreparedResponse:
    context: SimplePirContext
    results_without_response: np.ndarray

    def integrate(self, responses: np.ndarray, index: int) -> list[int]:
        ctx = self.context
        b = ctx.params.encryption_params.ciphertext_modulus_bits
        p = ctx.params.encryption_params.plaintext_modulus_bits
        extracted = ctx.extract_entries(responses, index)
        out = (extracted - self.results_without_response + (ctx.delta >> 1)) % (1 << b)
        return [int(v) >> (b - p) for v in out.reshape(-1)]


# ---------------------------------------------------------------------------
# Multi-shard layout (DatabaseMap.swift:23-110, SimplePir+Shards.swift:18-188)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ChunkLocation:
    shard_index: int
    index: int


@dataclass(frozen=True)
class DatabaseMapEntry:
    original_index: int
    size: int
    chunks: tuple


@dataclass(frozen=True)
class DatabaseMap:
    """Tracks where each entry's chunks landed across shards."""

    entries: tuple
    chunk_size: int

    @staticmethod
    def shard_database(entries, shard_count: int, chunk_size: int, rng=None):
        """entries: iterable of (original_index, value bytes). Chunks are
        spread over a per-entry random shard permutation; returns
        (DatabaseMap, [shard byte-matrices as list[bytes]])."""
        import random as rnd

        rng = rng or rnd.Random()
        out_entries = []
        shards: list[list[bytes]] = [[] for _ in range(shard_count)]
        for original_index, value in entries:
            chunks = []
            order = list(range(shard_count))
            rng.shuffle(order)
            v = bytes(value)
            n_chunks = max(1, -(-len(v) // chunk_size)) if v else 1
            for ci in range(n_chunks):
                chunk = v[ci * chunk_size : (ci + 1) * chunk_size]
                chunk = chunk + b"\x00" * (chunk_size - len(chunk))
                shard_index = order[ci % shard_count]
                chunks.append(ChunkLocation(shard_index, len(shards[shard_index])))
                shards[shard_index].append(chunk)
            out_entries.append(
                DatabaseMapEntry(original_index, len(v), tuple(chunks))
            )
        return DatabaseMap(tuple(out_entries), chunk_size), shards


class ShardMap:
    """original index -> entry lookup + per-shard query budget."""

    def __init__(self, database_map: DatabaseMap):
        self.mapping = {e.original_index: e for e in database_map.entries}
        shard_ids = {c.shard_index for e in self.mapping.values() for c in e.chunks}
        self.shard_count = len(shard_ids)
        self.maximum_chunk_count = max(
            (len(e.chunks) for e in self.mapping.values()), default=0
        )
        self.chunk_size = database_map.chunk_size
        self.chunks_per_shard = -(-self.maximum_chunk_count // max(self.shard_count, 1))

    def __getitem__(self, original_index: int):
        return self.mapping.get(original_index)


class SimplePirClientForAllShards:
    """Queries every shard (with dummy index-0 queries for padding) so the
    access pattern does not leak which shards hold the entry."""

    def __init__(self, database_map: DatabaseMap, clients: list):
        self.shard_map = ShardMap(database_map)
        self.clients = clients
        if self.shard_map.shard_count > len(clients):
            raise errors.PirError("mismatching shard count and clients")

    @property
    def queries_per_shard(self) -> int:
        return self.shard_map.chunks_per_shard

    def query(self, original_index: int, rng=None):
        query_indices = [[] for _ in self.clients]
        entry = self.shard_map[original_index]
        if entry is not None:
            for chunk in entry.chunks:
                query_indices[chunk.shard_index].append(chunk.index)
        for per_shard in query_indices:
            while len(per_shard) < self.shard_map.chunks_per_shard:
                per_shard.append(0)
        return [
            [client.query(i, rng=rng) for i in indices]
            for client, indices in zip(self.clients, query_indices)
        ]

    def decrypt(self, responses, original_index: int, queries) -> bytes | None:
        entry = self.shard_map[original_index]
        if entry is None:
            return None
        data = b""
        for ci, chunk in enumerate(entry.chunks):
            shard = chunk.shard_index
            slot = [
                i
                for i, q in enumerate(queries[shard])
                if q.index == chunk.index
            ][0]
            q = queries[shard][slot]
            prepared = q.prepare_response()
            piece = self.clients[shard].decrypt(
                responses[shard][slot], prepared, chunk.index
            )
            data += piece[: self.shard_map.chunk_size]
        return data[: entry.size]


class SimplePirClient:
    def __init__(self, params: SimplePirParameters, hint: np.ndarray):
        self.context = SimplePirContext(params)
        self.hint = hint
        self._a_polys_eval = [
            polymod.forward_ntt(p) for p in self.context.generate_a_polynomials()
        ]

    def precompute_query(self, rng=None) -> PrecomputedQueryWithoutIndices:
        ctx = self.context
        secret_polys = ctx.generate_secret_polys(rng)
        queries = ctx.encrypt_zero(self._a_polys_eval, secret_polys, rng)
        secret_matrix = np.stack([s.to_values()[0] for s in secret_polys])
        results = (secret_matrix @ self.hint.T) % ctx.ntt_friendly_mod
        return PrecomputedQueryWithoutIndices(ctx, queries, results)

    def query(self, index: int, rng=None) -> PrecomputedQueryWithIndices:
        return self.precompute_query(rng).add(index)

    def decrypt(self, responses: np.ndarray, prepared: PreparedResponse, index: int) -> bytes:
        coeffs = prepared.integrate(responses, index)
        data = ser.coefficients_to_bytes(
            coeffs, self.context.params.encryption_params.plaintext_modulus_bits
        )
        return bytes(data[: self.context.params.entry_size_in_bytes])

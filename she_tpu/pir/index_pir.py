"""Index PIR: MulPIR (eprint 2019/1483) over the TPU BFV core.

Reference: Sources/PrivateInformationRetrieval/IndexPir/{IndexPirProtocol,
MulPir,PirUtil}.swift. Covers config/parameter generation (uneven-dimensions
optimization, key-compression Galois element selection), oblivious query
expansion (SealPIR-style binary tree of Galois + shift steps), query
compression, server response computation (dim-0 ct-pt inner products +
higher-dim ct-ct inner products with relinearization), database processing
(entry packing/splitting with dimension reordering), and the v1 processed-
database binary format.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum

import numpy as np

from .. import errors
from ..bfv import bfv, keys
from ..core.poly import COEFF, EVAL, PolyRq
from ..io import serialize as ser
from ..utils import nt


class PirKeyCompression(Enum):
    NO_COMPRESSION = "noCompression"
    HYBRID = "hybridCompression"
    MAX = "maxCompression"


def entry_size_encoding_width(entry_size: int) -> int:
    if entry_size <= 0xFF:
        return 1
    if entry_size <= 0xFFFF:
        return 2
    if entry_size <= 0xFFFFFFFF:
        return 4
    return 8


def encode_entry_size(entry_size: int, width: int) -> bytes:
    if width not in (1, 2, 4, 8):
        raise errors.PirError(f"invalid entry size encoding width {width}")
    if entry_size >= 1 << (8 * width):
        raise errors.PirError(f"entry size {entry_size} too large for {width} bytes")
    return entry_size.to_bytes(width, "little")


def decode_entry_size(data: bytes) -> int:
    return int.from_bytes(data, "little")


@dataclass(frozen=True)
class IndexPirConfig:
    """Reference IndexPirProtocol.swift:44-157."""

    entry_count: int
    entry_size_in_bytes: int
    dimension_count: int = 2
    batch_size: int = 1
    uneven_dimensions: bool = True
    key_compression: PirKeyCompression = PirKeyCompression.NO_COMPRESSION
    encoding_entry_size: bool = False

    def __post_init__(self):
        if self.dimension_count not in (1, 2):
            raise errors.PirError(f"dimensionCount must be 1 or 2, got {self.dimension_count}")

    @property
    def entry_size_encoding_width(self) -> int:
        return entry_size_encoding_width(self.entry_size_in_bytes) if self.encoding_entry_size else 0

    @property
    def encoded_entry_size(self) -> int:
        return self.entry_size_encoding_width + self.entry_size_in_bytes


@dataclass(frozen=True)
class IndexPirParameter:
    entry_count: int
    entry_size_in_bytes: int
    dimensions: tuple[int, ...]
    batch_size: int
    evaluation_key_config: keys.EvaluationKeyConfig
    encoding_entry_size: bool = False

    @property
    def entry_size_encoding_width(self) -> int:
        return entry_size_encoding_width(self.entry_size_in_bytes) if self.encoding_entry_size else 0

    @property
    def encoded_entry_size(self) -> int:
        return self.entry_size_encoding_width + self.entry_size_in_bytes

    @property
    def expanded_query_count(self) -> int:
        return sum(self.dimensions)


@dataclass
class Query:
    ciphertexts: list
    indices_count: int


@dataclass
class Response:
    ciphertexts: list  # [[Ciphertext Coeff]] — per query, per chunk


@dataclass
class ProcessedDatabase:
    """Eval plaintexts with None = skipped zero plaintext
    (IndexPirProtocol.swift:249-379)."""

    plaintexts: list

    SERIALIZATION_VERSION = 1

    @property
    def count(self) -> int:
        return len(self.plaintexts)

    def serialize(self, context) -> bytes:
        out = [bytes([self.SERIALIZATION_VERSION]), len(self.plaintexts).to_bytes(4, "little")]
        for pt in self.plaintexts:
            if pt is None:
                out.append(b"\x00")
            else:
                out.append(b"\x01")
                out.append(ser.serialize_plaintext(pt))
        return b"".join(out)

    @classmethod
    def deserialize(cls, data: bytes, context) -> "ProcessedDatabase":
        if data[0] != cls.SERIALIZATION_VERSION:
            raise errors.PirError(f"bad serialization version {data[0]}")
        count = int.from_bytes(data[1:5], "little")
        offset = 5
        poly_ctx = context.ciphertext_context
        nbytes = ser.poly_serialization_byte_count(poly_ctx)
        plaintexts = []
        for _ in range(count):
            tag = data[offset]
            offset += 1
            if tag == 0:
                plaintexts.append(None)
            elif tag == 1:
                plaintexts.append(
                    ser.deserialize_plaintext(
                        data[offset : offset + nbytes], context, EVAL
                    )
                )
                offset += nbytes
            else:
                raise errors.PirError(f"bad plaintext tag {tag}")
        return cls(plaintexts)


# ---------------------------------------------------------------------------
# MulPIR parameter generation
# ---------------------------------------------------------------------------


def evaluation_key_config(
    expanded_query_count: int, degree: int, key_compression: PirKeyCompression
) -> keys.EvaluationKeyConfig:
    """Galois elements {2^l + 1} for the expansion depth, compressed variants
    take every other power (reference MulPir.swift:86-109)."""
    max_depth = ser.ceil_log2(min(expanded_query_count, degree))
    log2n = nt.log2_exact(degree)
    smallest = log2n - max_depth + 1
    if key_compression == PirKeyCompression.NO_COMPRESSION:
        largest = log2n
    else:
        largest = max(smallest, -(-(log2n + 1) // 2))
    elements = [(1 << level) + 1 for level in range(smallest, largest + 1)]
    if key_compression == PirKeyCompression.HYBRID:
        extra_power = max(largest, (log2n + largest + 1) // 2)
        extra = (1 << extra_power) + 1
        if extra not in elements:
            elements.append(extra)
    return keys.EvaluationKeyConfig(tuple(elements), has_relinearization_key=True)


def generate_parameter(config: IndexPirConfig, context: bfv.BfvContext) -> IndexPirParameter:
    """Reference MulPir.swift:37-83 (incl. uneven-dimensions optimization)."""
    encoded_entry_size = config.encoded_entry_size
    bpp = context.params.bytes_per_plaintext
    if encoded_entry_size <= bpp:
        per_chunk = -(-config.entry_count // (bpp // encoded_entry_size))
    else:
        per_chunk = config.entry_count
    dim_size = int(math.floor(per_chunk ** (1.0 / config.dimension_count)))
    dims = [dim_size] * config.dimension_count
    for i in range(len(dims)):
        if math.prod(dims) < per_chunk:
            dims[i] += 1
        else:
            break
    if config.uneven_dimensions and config.dimension_count == 2:
        limit = nt.next_power_of_two(sum(dims) * config.batch_size)
        new_dims = list(dims)
        while nt.next_power_of_two(sum(new_dims) * config.batch_size) <= limit:
            dims = list(new_dims)
            if new_dims[1] == 1:
                break
            new_dims[1] -= 1
            new_dims[0] = -(-per_chunk // new_dims[1])
    ek_config = evaluation_key_config(
        sum(dims) * config.batch_size, context.degree, config.key_compression
    )
    return IndexPirParameter(
        entry_count=config.entry_count,
        entry_size_in_bytes=config.entry_size_in_bytes,
        dimensions=tuple(dims),
        batch_size=config.batch_size,
        evaluation_key_config=ek_config,
        encoding_entry_size=config.encoding_entry_size,
    )


def per_chunk_plaintext_count(parameter: IndexPirParameter) -> int:
    return math.prod(parameter.dimensions)


def chunk_count(parameter: IndexPirParameter, context: bfv.BfvContext) -> int:
    return -(-parameter.encoded_entry_size // context.params.bytes_per_plaintext)


# ---------------------------------------------------------------------------
# Oblivious expansion (PirUtil.swift:190-355)
# ---------------------------------------------------------------------------


def expand_ciphertext_for_one_step(ct, log_step: int, evaluation_key):
    """One expansion step: (ct + g(ct), x^{-2^(logStep-1)} * (ct - g(ct)))
    where g substitutes x -> x^(N/2^(logStep-1) + 1)."""
    degree = ct.context.degree
    log2n = nt.log2_exact(degree)
    shifting_power = 1 << (log_step - 1)
    target_element = (1 << (log2n - log_step + 1)) + 1
    available = [
        e for e in evaluation_key.galois_key.keys if e <= target_element
    ] if evaluation_key.galois_key else []
    if not available:
        raise errors.MissingGaloisKey(str(target_element))
    element = max(available)
    apply_count = 1 << (
        ser.floor_log2(target_element - 1) - ser.floor_log2(element - 1)
    )
    c1 = ct
    current = 1
    for _ in range(apply_count):
        c1 = bfv.apply_galois(c1, element, evaluation_key)
        current = (current * element) % (2 * degree)
    assert current == target_element
    difference = bfv.ct_sub(ct, c1)
    difference = bfv.multiply_power_of_x(difference, -shifting_power)
    c1 = bfv.ct_add(c1, ct)
    return c1, difference


def expand_ciphertext(ct, output_count: int, log_step: int, expected_height: int, evaluation_key):
    """Binary-tree expansion with doubling-factor correction
    (PirUtil.swift:249-304)."""
    assert 0 <= output_count <= ct.context.degree
    if output_count == 1:
        if log_step > expected_height:
            return [ct]
        return [bfv.ct_add(ct, ct)]
    second_half = output_count >> 1
    first_half = output_count - second_half
    p0, p1 = expand_ciphertext_for_one_step(ct, log_step, evaluation_key)
    first = expand_ciphertext(p0, first_half, log_step + 1, expected_height, evaluation_key)
    second = expand_ciphertext(p1, second_half, log_step + 1, expected_height, evaluation_key)
    out = []
    for a, b in zip(first[:second_half], second):
        out.extend([a, b])
    out.extend(first[second_half:])
    return out


def expand(ciphertexts: list, output_count: int, evaluation_key) -> list:
    degree = ciphertexts[0].context.degree
    assert (len(ciphertexts) - 1) * degree < output_count <= len(ciphertexts) * degree
    out = []
    remaining = output_count
    for ct in ciphertexts:
        n = min(remaining, degree)
        out.extend(
            expand_ciphertext(ct, n, 1, ser.ceil_log2(n), evaluation_key)
        )
        remaining -= n
    return out


def compress_binary_inputs(total_input_count: int, one_indices: list[int], context, secret_key) -> list:
    """Client-side query compression: 2^{-ceillog(count)} at the chosen slots
    (PirUtil.swift:361-404)."""
    t = context.plaintext_modulus
    out = []
    processed = 0
    remaining = total_input_count
    while remaining > 0:
        n = min(remaining, context.degree)
        inputs = [x - processed for x in one_indices if processed <= x < processed + n]
        inv = nt.inverse_mod(pow(2, ser.ceil_log2(n), t), t)
        raw = [0] * context.degree
        for idx in inputs:
            raw[idx] = inv
        pt = bfv.encode(context, raw)
        out.append(pt)
        processed += n
        remaining -= n
    return [bfv.encrypt(pt, secret_key) for pt in out]


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class MulPirClient:
    def __init__(self, parameter: IndexPirParameter, context: bfv.BfvContext):
        self.parameter = parameter
        self.context = context

    @property
    def evaluation_key_config(self):
        return self.parameter.evaluation_key_config

    @property
    def entry_chunks_per_plaintext(self) -> int:
        bpp = self.context.params.bytes_per_plaintext
        if bpp >= self.parameter.encoded_entry_size:
            return bpp // self.parameter.encoded_entry_size
        return 1

    def generate_evaluation_key(self, secret_key, err_rng=None):
        return keys.generate_evaluation_key(
            self.context, self.evaluation_key_config, secret_key, err_rng
        )

    def compute_coordinates(self, index: int) -> list[int]:
        if not 0 <= index < self.parameter.entry_count:
            raise errors.PirError(f"invalid index {index}")
        pt_index = index // self.entry_chunks_per_plaintext
        product = math.prod(self.parameter.dimensions)
        coords = []
        for dim in self.parameter.dimensions:
            product //= dim
            coords.append(pt_index // product)
            pt_index -= coords[-1] * product
        return coords

    def generate_query(self, indices: list[int], secret_key) -> Query:
        acc = 0
        one_indices = []
        for index in indices:
            coords = self.compute_coordinates(index)
            for dim_index, dim_size in enumerate(self.parameter.dimensions):
                one_indices.append(acc + coords[dim_index])
                acc += dim_size
        cts = compress_binary_inputs(
            self.parameter.expanded_query_count * len(indices),
            one_indices,
            self.context,
            secret_key,
        )
        return Query(cts, len(indices))

    @property
    def expected_response_ciphertext_count(self) -> int:
        return chunk_count(self.parameter, self.context)

    def decrypt(self, response: Response, indices: list[int], secret_key) -> list[bytes]:
        if len(response.ciphertexts) != len(indices):
            raise errors.PirError("response count mismatch")
        t = self.context.plaintext_modulus
        bits = ser.floor_log2(t)
        out = []
        for reply, entry_index in zip(response.ciphertexts, indices):
            if len(reply) != self.expected_response_ciphertext_count:
                raise errors.PirError("reply chunk count mismatch")
            data = b""
            for ct in reply:
                pt = bfv.decrypt(ct, secret_key)
                coeffs = bfv.decode(self.context, pt)
                data += ser.coefficients_to_bytes(coeffs, bits)
            pos = entry_index % self.entry_chunks_per_plaintext
            size = self.parameter.encoded_entry_size
            chunk = data[pos * size : (pos + 1) * size]
            if self.parameter.encoding_entry_size:
                w = self.parameter.entry_size_encoding_width
                entry_size = decode_entry_size(chunk[:w])
                out.append(chunk[w : w + entry_size])
            else:
                out.append(chunk)
        return out


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------


class MulPirServer:
    def __init__(self, parameter: IndexPirParameter, context: bfv.BfvContext, databases: list[ProcessedDatabase]):
        self.parameter = parameter
        self.context = context
        self.databases = databases
        expected = chunk_count(parameter, context) * per_chunk_plaintext_count(parameter)
        for db in databases:
            if db.count != expected:
                raise errors.PirError(
                    f"database has {db.count} plaintexts, expected {expected}"
                )

    @property
    def evaluation_key_config(self):
        return self.parameter.evaluation_key_config

    def compute_response_for_one_chunk(self, dim0_query_eval, remaining_query, data_chunk, evaluation_key):
        """PirUtil.swift:408-486."""
        parameter = self.parameter
        per_chunk = per_chunk_plaintext_count(parameter)
        columns = per_chunk // parameter.dimensions[0]
        assert columns == 1 or columns == len(remaining_query)
        results = []
        for col in range(columns):
            start = len(dim0_query_eval) * col
            end = min(start + len(dim0_query_eval), len(data_chunk))
            pts = list(data_chunk[start:end])
            if all(p is None for p in pts):
                # zero column: inner product of nothing = transparent zero
                zero = bfv.Ciphertext(
                    self.context,
                    [
                        PolyRq.zero(dim0_query_eval[0].polys[0].context, COEFF)
                        for _ in range(2)
                    ],
                )
                results.append(zero)
                continue
            acc = bfv.inner_product_ct_pt(dim0_query_eval, pts)
            results.append(bfv.ct_to_coeff(acc))
        query_start = 0
        for dim_size in parameter.dimensions[1:]:
            new_results = []
            for start in range(0, len(results), dim_size):
                v0 = remaining_query[query_start : query_start + dim_size]
                v1 = results[start : start + dim_size]
                prod = bfv.inner_product_ct_ct(v0, v1)
                prod = bfv.relinearize(prod, evaluation_key)
                new_results.append(prod)
            results = new_results
            query_start += dim_size
        assert len(results) == 1
        single = bfv.mod_switch_down_to_single(results[0])
        return bfv.ct_to_coeff(single)

    def compute_response(self, query: Query, evaluation_key) -> Response:
        """PirUtil.swift:490-568."""
        parameter = self.parameter
        if len(self.databases) != 1 and len(self.databases) < query.indices_count:
            raise errors.PirError("invalid batch size")
        expanded = expand(
            query.ciphertexts,
            parameter.expanded_query_count * query.indices_count,
            evaluation_key,
        )
        n_chunks = chunk_count(parameter, self.context)
        per_query = parameter.expanded_query_count
        responses = []
        for q in range(query.indices_count):
            db = self.databases[0 if len(self.databases) == 1 else q]
            q_cts = expanded[q * per_query : (q + 1) * per_query]
            dim0 = [bfv.ct_to_eval(c) for c in q_cts[: parameter.dimensions[0]]]
            rest = q_cts[parameter.dimensions[0] :]
            per_chunk = db.count // n_chunks
            reply = []
            for start in range(0, db.count, per_chunk):
                reply.append(
                    self.compute_response_for_one_chunk(
                        dim0, rest, db.plaintexts[start : start + per_chunk], evaluation_key
                    )
                )
            responses.append(reply)
        return Response(responses)

    # -- database processing (MulPir.swift:430-556) -----------------------

    @classmethod
    def process(cls, database: list[bytes], context: bfv.BfvContext, parameter: IndexPirParameter) -> ProcessedDatabase:
        if len(database) != parameter.entry_count:
            raise errors.PirError(
                f"{len(database)} entries, expected {parameter.entry_count}"
            )
        max_size = max((len(e) for e in database), default=0)
        if max_size > parameter.entry_size_in_bytes:
            raise errors.PirError(f"entry size {max_size} too large")
        bpp = context.params.bytes_per_plaintext
        n_chunks = chunk_count(parameter, context)
        if n_chunks > 1:
            return cls._process_split_large_entries(database, context, parameter)
        return cls._process_pack_entries(database, context, parameter)

    @staticmethod
    def _encode_plaintext_rows(context, rows: list[np.ndarray]):
        """Batch-encode coefficient rows; None for all-zero rows."""
        nonzero_idx = [i for i, r in enumerate(rows) if r.any()]
        out = [None] * len(rows)
        if nonzero_idx:
            batch = np.stack([rows[i] for i in nonzero_idx]).astype(object)
            encoded = bfv.batch_encode_to_eval(context, batch)
            for j, i in enumerate(nonzero_idx):
                out[i] = encoded[j]
        return out

    @classmethod
    def _process_pack_entries(cls, database, context, parameter) -> ProcessedDatabase:
        bpp = context.params.bytes_per_plaintext
        t = context.plaintext_modulus
        bits = ser.floor_log2(t)
        flat = bytearray()
        for entry in database:
            e = bytes(entry)
            if parameter.encoding_entry_size:
                e = encode_entry_size(len(e), parameter.entry_size_encoding_width) + e
            flat += e + b"\x00" * (parameter.encoded_entry_size - len(e))
        entries_per_pt = bpp // parameter.encoded_entry_size
        bytes_per_pt = entries_per_pt * parameter.encoded_entry_size
        rows = []
        for start in range(0, len(flat), bytes_per_pt):
            chunk = bytes(flat[start : start + bytes_per_pt])
            coeffs = ser.bytes_to_coefficients(chunk, bits, decode=False)
            row = np.zeros(context.degree, dtype=object)
            row[: len(coeffs)] = coeffs
            rows.append(row)
        per_chunk = per_chunk_plaintext_count(parameter)
        while len(rows) < per_chunk:
            rows.append(np.zeros(context.degree, dtype=object))
        plaintexts = cls._encode_plaintext_rows(context, rows)
        # reorder for sequential access at query time
        remaining = per_chunk // parameter.dimensions[0]
        reordered = []
        for skip in range(remaining):
            for row_index in range(skip, len(plaintexts), remaining):
                reordered.append(plaintexts[row_index])
        return ProcessedDatabase(reordered)

    @classmethod
    def _process_split_large_entries(cls, database, context, parameter) -> ProcessedDatabase:
        bpp = context.params.bytes_per_plaintext
        t = context.plaintext_modulus
        bits = ser.floor_log2(t)
        n_chunks = chunk_count(parameter, context)
        per_entry_rows: list[list[np.ndarray | None]] = []
        for entry in database:
            e = bytes(entry)
            chunks = []
            for start in range(0, parameter.encoded_entry_size, bpp):
                entry_start = start - parameter.entry_size_encoding_width
                end = min(entry_start + bpp, len(e))
                if entry_start >= end:
                    chunks.append(None)
                    continue
                if start == 0 and parameter.encoding_entry_size:
                    data = (
                        encode_entry_size(len(e), parameter.entry_size_encoding_width)
                        + e[0:end]
                    )
                else:
                    data = e[entry_start:end]
                coeffs = ser.bytes_to_coefficients(data, bits, decode=False)
                row = np.zeros(context.degree, dtype=object)
                row[: len(coeffs)] = coeffs
                chunks.append(row if row.any() else None)
            per_entry_rows.append(chunks)
        per_chunk = per_chunk_plaintext_count(parameter)
        while len(per_entry_rows) < per_chunk:
            per_entry_rows.append([None] * n_chunks)
        # flatten with dimension reordering
        remaining = per_chunk // parameter.dimensions[0]
        ordered_rows: list[np.ndarray | None] = []
        for chunk in range(n_chunks):
            for skip in range(remaining):
                for row_index in range(skip, len(per_entry_rows), remaining):
                    ordered_rows.append(per_entry_rows[row_index][chunk])
        # batch encode non-None
        rows_np = [
            r if r is not None else np.zeros(context.degree, dtype=object)
            for r in ordered_rows
        ]
        encoded = cls._encode_plaintext_rows(context, rows_np)
        plaintexts = [
            e if ordered_rows[i] is not None else None for i, e in enumerate(encoded)
        ]
        return ProcessedDatabase(plaintexts)

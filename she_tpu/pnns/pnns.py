"""Private Nearest Neighbor Search: encrypted cosine-similarity scoring.

Reference: Sources/PrivateNearestNeighborSearch/*.swift. Covers matrix
packings (denseColumn / denseRow / diagonal with baby-step-giant-step),
the Halevi-Shoup BSGS encrypted matrix-vector product (eprint 2018/244
Sec. 6.3), plaintext-CRT for >log2(t) precision, dense-row extraction,
result packing via rotate-and-sum, and client/server protocol types.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum

import numpy as np

from .. import errors
from ..bfv import bfv, keys
from ..core import poly as polymod
from ..core.poly import COEFF, EVAL, PolyRq
from ..ops import galois as galoismod
from ..utils import nt


class DistanceMetric(Enum):
    COSINE_SIMILARITY = "cosineSimilarity"


@dataclass(frozen=True)
class MatrixDimensions:
    row_count: int
    column_count: int

    def __post_init__(self):
        if self.row_count <= 0 or self.column_count <= 0:
            raise errors.PnnsError(f"invalid dimensions {self}")

    @property
    def count(self) -> int:
        return self.row_count * self.column_count


@dataclass(frozen=True)
class BabyStepGiantStep:
    """g ~ sqrt(D) decomposition (MatrixMultiplication.swift:25-61)."""

    vector_dimension: int
    baby_step: int
    giant_step: int

    @classmethod
    def create(cls, vector_dimension: int, baby_step: int | None = None) -> "BabyStepGiantStep":
        dim = nt.next_power_of_two(vector_dimension)
        if baby_step is None:
            baby_step = int(math.ceil(math.sqrt(dim)))
        giant_step = -(-dim // baby_step)
        return cls(dim, baby_step, giant_step)


@dataclass(frozen=True)
class MatrixPacking:
    kind: str  # 'denseColumn' | 'denseRow' | 'diagonal'
    bsgs: BabyStepGiantStep | None = None

    @classmethod
    def dense_column(cls):
        return cls("denseColumn")

    @classmethod
    def dense_row(cls):
        return cls("denseRow")

    @classmethod
    def diagonal(cls, bsgs: BabyStepGiantStep):
        return cls("diagonal", bsgs)


def _simd_dims(context: bfv.BfvContext) -> tuple[int, int]:
    d = context.simd_dimensions()
    if d is None:
        raise errors.PnnsError("parameters do not support SIMD encoding")
    return d


def plaintext_count(context: bfv.BfvContext, dims: MatrixDimensions, packing: MatrixPacking) -> int:
    """PlaintextMatrix.plaintextCount (PlaintextMatrix.swift:236-275)."""
    simd_rows, simd_cols = _simd_dims(context)
    n = context.degree
    if packing.kind == "denseColumn":
        cols_per_pt = simd_rows * (simd_cols // dims.row_count) if dims.row_count <= simd_cols else 0
        if cols_per_pt > 1:
            return -(-dims.column_count // cols_per_pt)
        return dims.column_count * (-(-dims.row_count // n))
    if packing.kind == "denseRow":
        if dims.column_count > simd_cols:
            raise errors.PnnsError("too many columns for denseRow")
        rows_per_pt = simd_rows * (simd_cols // nt.next_power_of_two(dims.column_count))
        return -(-dims.row_count // rows_per_pt)
    pts_per_col = -(-dims.row_count // n)
    return nt.next_power_of_two(dims.column_count) * pts_per_col


@dataclass
class PlaintextMatrix:
    dimensions: MatrixDimensions
    packing: MatrixPacking
    plaintexts: list  # [bfv.Plaintext]
    context: bfv.BfvContext

    @property
    def row_count(self):
        return self.dimensions.row_count

    @property
    def column_count(self):
        return self.dimensions.column_count

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_values(cls, context, dims: MatrixDimensions, packing: MatrixPacking, values: list[int]):
        """values: row-major, already in [0, t)."""
        if len(values) != dims.count:
            raise errors.PnnsError(f"{len(values)} values for {dims}")
        if packing.kind == "denseColumn":
            pts = cls._dense_column_plaintexts(context, dims, values)
        elif packing.kind == "denseRow":
            pts = cls._dense_row_plaintexts(context, dims, values)
        else:
            pts = cls._diagonal_plaintexts(context, dims, packing, values)
        expected = plaintext_count(context, dims, packing)
        assert len(pts) == expected, (len(pts), expected)
        return cls(dims, packing, pts, context)

    @classmethod
    def from_signed_values(cls, context, dims, packing, signed_values, reduce: bool = False):
        t = context.plaintext_modulus
        if reduce:
            centered = [v % t for v in signed_values]
        else:
            lo, hi = -(t >> 1), (t - 1) >> 1
            for v in signed_values:
                if not lo <= v <= hi:
                    raise errors.PnnsError(f"signed value {v} out of range")
            centered = [v % t for v in signed_values]
        return cls.from_values(context, dims, packing, centered)

    @staticmethod
    def _dense_column_plaintexts(context, dims, values):
        """PlaintextMatrix.swift:285-332."""
        n = context.degree
        _, simd_cols = _simd_dims(context)
        pts = []
        packed: list[int] = []
        for col in range(dims.column_count):
            for row in range(dims.row_count):
                packed.append(values[row * dims.column_count + col])
                if len(packed) == n:
                    pts.append(bfv.encode(context, packed, fmt="simd"))
                    packed = []
            next_col = len(packed) + dims.row_count
            if len(packed) < simd_cols and simd_cols + 1 <= next_col <= n:
                pad = (n - len(packed)) % simd_cols
                packed += [0] * pad
            elif next_col > n:
                pts.append(bfv.encode(context, packed, fmt="simd"))
                packed = []
        if packed:
            pts.append(bfv.encode(context, packed, fmt="simd"))
        return pts

    @staticmethod
    def _dense_row_plaintexts(context, dims, values):
        """PlaintextMatrix.swift:341-416."""
        n = context.degree
        simd_rows, simd_cols = _simd_dims(context)
        assert simd_rows == 2
        if dims.column_count > simd_cols:
            raise errors.PnnsError("too many columns")
        pad_cols = nt.next_power_of_two(dims.column_count) - dims.column_count
        pts = []
        packed: list[int] = []
        idx = 0
        for _ in range(dims.row_count):
            packed.extend(values[idx : idx + dims.column_count])
            idx += dims.column_count
            packed.extend([0] * pad_cols)
            if len(packed) < simd_cols and len(packed) + dims.column_count > simd_cols:
                packed += [0] * (simd_cols - len(packed))
            if len(packed) + dims.column_count > n:
                pts.append(bfv.encode(context, packed, fmt="simd"))
                packed = []
        if packed:
            col_offset = len(packed) % simd_cols
            pad = 0 if col_offset == 0 else nt.next_power_of_two(col_offset) - col_offset
            packed += [0] * pad
            repeat = packed[:] if len(packed) <= simd_cols else packed[simd_cols:]
            while len(packed) < n:
                packed += repeat
            pts.append(bfv.encode(context, packed[:n], fmt="simd"))
        return pts

    @staticmethod
    def _diagonal_plaintexts(context, dims, packing, values):
        """Generalized diagonals with BSGS pre-rotation
        (PlaintextMatrix.swift:417-487)."""
        n = context.degree
        simd_rows, simd_cols = _simd_dims(context)
        assert simd_rows == 2
        if dims.column_count > simd_cols:
            raise errors.PnnsError("too many columns")
        bsgs = packing.bsgs
        cols_pow2 = nt.next_power_of_two(dims.column_count)
        packed = np.zeros((cols_pow2, dims.row_count), dtype=np.int64)
        data = np.array(values, dtype=np.int64).reshape(dims.row_count, dims.column_count)
        for r in range(cols_pow2):
            for c in range(dims.row_count):
                pc = (c + r) % cols_pow2
                if pc < dims.column_count:
                    packed[r, c] = data[c, pc]
        pts = []
        expected = plaintext_count(context, dims, packing)
        pts_per_col = expected // cols_pow2
        for r in range(cols_pow2):
            row = list(packed[r])
            for chunk_index, start in enumerate(range(0, len(row), n)):
                chunk = row[start : start + n]
                chunk += [0] * (n - len(chunk))
                i = (len(pts) - chunk_index) // pts_per_col
                rotation = (i // bsgs.baby_step) * bsgs.baby_step
                if rotation != 0:
                    half = n // 2
                    first = chunk[:half]
                    second = chunk[half:]
                    chunk = list(np.roll(first, rotation)) + list(np.roll(second, rotation))
                pts.append(bfv.encode(context, [int(v) for v in chunk], fmt="simd"))
        return pts

    # -- unpack ------------------------------------------------------------

    def unpack(self) -> list[int]:
        if self.packing.kind == "denseColumn":
            return self._unpack_dense_column()
        if self.packing.kind == "denseRow":
            return self._unpack_dense_row()
        return self._unpack_diagonal()

    def unpack_signed(self) -> list[int]:
        t = self.context.plaintext_modulus
        return [v - t if v > (t - 1) >> 1 else v for v in self.unpack()]

    def _decode(self, pt) -> list[int]:
        return bfv.decode(self.context, pt, fmt="simd")

    def _unpack_dense_column(self) -> list[int]:
        simd_rows, simd_cols = _simd_dims(self.context)
        count = self.dimensions.count
        rc = self.row_count
        cols_per_pt = simd_rows * (simd_cols // rc) if rc <= simd_cols else 0
        col_major: list[int] = []
        for pt in self.plaintexts:
            decoded = self._decode(pt)
            if cols_per_pt > 1:
                per_row = rc * (simd_cols // rc)
                take = min(per_row, count - len(col_major))
                col_major += decoded[:take]
                take = min(per_row, count - len(col_major))
                col_major += decoded[simd_cols : simd_cols + take]
            else:
                in_row = len(col_major) % rc
                end = min(len(decoded), rc - in_row)
                col_major += decoded[:end]
        if len(col_major) < count:
            raise errors.PnnsError("unpack underflow")
        arr = np.array(col_major[:count]).reshape(self.column_count, self.row_count)
        return [int(v) for v in arr.T.reshape(-1)]

    def _unpack_dense_row(self) -> list[int]:
        simd_rows, simd_cols = _simd_dims(self.context)
        count = self.dimensions.count
        cc = self.column_count
        cc_pow2 = nt.next_power_of_two(cc)
        cols_per_simd_row = simd_cols // cc_pow2
        pad = cc_pow2 - cc
        values: list[int] = []
        for pt in self.plaintexts:
            decoded = self._decode(pt)
            for simd_row in range(simd_rows):
                for ci in range(cols_per_simd_row):
                    start = simd_row * simd_cols + ci * cc + ci * pad
                    end = start + min(cc, count - len(values))
                    values += decoded[start:end]
                    if len(values) == count:
                        return values
        if len(values) != count:
            raise errors.PnnsError("unpack underflow")
        return values

    def _unpack_diagonal(self) -> list[int]:
        bsgs = self.packing.bsgs
        n = self.context.degree
        middle = n // 2
        cc_pow2 = nt.next_power_of_two(self.column_count)
        expected = plaintext_count(self.context, self.dimensions, self.packing)
        pts_per_col = expected // cc_pow2
        packed_rows: list[list[int]] = []
        chunk_size = bsgs.baby_step * pts_per_col
        for chunk_index in range(0, len(self.plaintexts), chunk_size):
            rotation = (chunk_index // chunk_size) * bsgs.baby_step
            rotated = []
            for pt in self.plaintexts[chunk_index : chunk_index + chunk_size]:
                decoded = self._decode(pt)
                first = list(np.roll(decoded[:middle], -rotation))
                second = list(np.roll(decoded[middle:], -rotation))
                rotated.append(first + second)
            for d0 in range(0, len(rotated), pts_per_col):
                diag = [v for r in rotated[d0 : d0 + pts_per_col] for v in r][: self.row_count]
                packed_rows.append(diag)
        values = np.zeros((self.row_count, self.column_count), dtype=np.int64)
        cnt = 0
        for r, diag in enumerate(packed_rows):
            for c in range(len(diag)):
                vc = (r + c) % cc_pow2
                if vc < self.column_count:
                    values[c, vc] = diag[c]
                    cnt += 1
        if cnt != self.dimensions.count:
            raise errors.PnnsError("diagonal unpack count mismatch")
        return [int(v) for v in values.reshape(-1)]

    # -- conversions -------------------------------------------------------

    def to_eval(self) -> "PlaintextMatrix":
        return PlaintextMatrix(
            self.dimensions,
            self.packing,
            [bfv.plaintext_to_eval(self.context, pt) for pt in self.plaintexts],
            self.context,
        )

    def encrypt(self, secret_key, err_rng=None) -> "CiphertextMatrix":
        cts = [bfv.encrypt(pt, secret_key, err_rng=err_rng) for pt in self.plaintexts]
        return CiphertextMatrix(self.dimensions, self.packing, cts, self.context)


@dataclass
class CiphertextMatrix:
    dimensions: MatrixDimensions
    packing: MatrixPacking
    ciphertexts: list
    context: bfv.BfvContext

    @property
    def row_count(self):
        return self.dimensions.row_count

    @property
    def column_count(self):
        return self.dimensions.column_count

    def decrypt(self, secret_key) -> PlaintextMatrix:
        pts = [bfv.decrypt(ct, secret_key) for ct in self.ciphertexts]
        return PlaintextMatrix(self.dimensions, self.packing, pts, self.context)

    def to_coeff(self) -> "CiphertextMatrix":
        return CiphertextMatrix(
            self.dimensions, self.packing, [bfv.ct_to_coeff(c) for c in self.ciphertexts], self.context
        )

    def to_eval(self) -> "CiphertextMatrix":
        return CiphertextMatrix(
            self.dimensions, self.packing, [bfv.ct_to_eval(c) for c in self.ciphertexts], self.context
        )

    def mod_switch_down_to_single(self) -> "CiphertextMatrix":
        return CiphertextMatrix(
            self.dimensions,
            self.packing,
            [bfv.mod_switch_down_to_single(c) for c in self.ciphertexts],
            self.context,
        )

    def noise_budget(self, secret_key) -> float:
        return min(bfv.noise_budget(ct, secret_key) for ct in self.ciphertexts)

    # -- dense row extraction (CiphertextMatrix.swift:219-372) -------------

    @staticmethod
    def extract_dense_row_config(context, dims: MatrixDimensions) -> keys.EvaluationKeyConfig:
        if dims.row_count == 1:
            return keys.EvaluationKeyConfig()
        _, simd_cols = _simd_dims(context)
        n = context.degree
        elements = [galoismod.swapping_rows_element(n)]
        cc_pow2 = nt.next_power_of_two(dims.column_count)
        if cc_pow2 != simd_cols:
            elements.append(galoismod.rotating_columns_element(cc_pow2, n))
        return keys.EvaluationKeyConfig(tuple(elements))

    def extract_dense_row(self, row_index: int, evaluation_key) -> "CiphertextMatrix":
        if self.packing.kind != "denseRow":
            raise errors.PnnsError("extractDenseRow requires denseRow packing")
        simd_rows, simd_cols = _simd_dims(self.context)
        assert simd_rows == 2
        n = self.context.degree
        cc_pow2 = nt.next_power_of_two(self.column_count)
        rows_per_simd_row = simd_cols // cc_pow2
        rows_per_ct = rows_per_simd_row * simd_rows
        ct_index = row_index // rows_per_ct
        if self.row_count == 1:
            return self

        def simd_slot_indices(r):
            ct_row = r % rows_per_ct
            start = ct_row * cc_pow2
            batch = (start, start + cc_pow2)
            if batch[0] <= simd_cols < batch[1]:
                batch = (simd_cols, simd_cols + cc_pow2)
            elif batch[1] > simd_cols:
                padding = simd_cols % cc_pow2
                batch = (batch[0] + padding, batch[1] + padding)
            if ct_index == len(self.ciphertexts) - 1:
                upper = -(-batch[1] // simd_cols) * simd_cols
                batch = (batch[0], upper)
            return batch

        batch = simd_slot_indices(row_index)
        last = row_index + 1
        while last < self.row_count and simd_slot_indices(last)[1] == batch[1]:
            last += 1
        first = row_index - 1 if row_index > 0 else 0
        while first > 0 and simd_slot_indices(first)[1] == batch[1]:
            first -= 1
        row_count_in_batch = last - first

        repeat_mask = [1] * cc_pow2 + [0] * (cc_pow2 * (row_count_in_batch - 1))
        repeat_mask += [0] * (nt.next_power_of_two(len(repeat_mask)) - len(repeat_mask))
        mask = [0] * batch[0]
        copies = 0
        while len(mask) < batch[1]:
            mask += repeat_mask
            copies += 1
        mask = mask[:n]
        mask += [0] * (n - len(mask))
        mask_pt = bfv.plaintext_to_eval(self.context, bfv.encode(self.context, mask, fmt="simd"))

        ct = bfv.ct_to_eval(self.ciphertexts[ct_index])
        ct = bfv.ct_to_coeff(bfv.ct_mul_pt(ct, mask_pt))
        rotate_count = simd_cols // (copies * cc_pow2) - 1
        copy_right = ct
        for _ in range(rotate_count):
            copy_right = bfv.rotate_columns(copy_right, cc_pow2, evaluation_key)
            ct = bfv.ct_add(ct, copy_right)
        swapped = bfv.swap_rows(ct, evaluation_key)
        ct = bfv.ct_add(ct, swapped)
        return CiphertextMatrix(
            MatrixDimensions(1, self.column_count), self.packing, [ct], self.context
        )


# ---------------------------------------------------------------------------
# Extras: multi-step rotations and rotate-and-sum (_HomomorphicEncryptionExtras)
# ---------------------------------------------------------------------------


def rotate_columns_multi_step(ct, step: int, evaluation_key):
    """Compose a rotation from available Galois keys
    (Extras/HeScheme.swift:62-105)."""
    if step == 0:
        return ct
    n = ct.context.degree
    if evaluation_key.galois_key is None:
        raise errors.MissingGaloisKey()
    element = galoismod.rotating_columns_element(step, n)
    if element in evaluation_key.galois_key.keys:
        return bfv.rotate_columns(ct, step, evaluation_key)
    elements = list(evaluation_key.galois_key.keys.keys())
    steps = [s for s in galoismod.steps_for(elements, n).values() if s is not None]
    positive = step + n // 2 if step < 0 else step
    plan = galoismod.plan_multi_step(steps, positive, n)
    if plan is None:
        raise errors.PnnsError(f"no multi-step plan for rotation {step}")
    for s, count in plan.items():
        for _ in range(count):
            ct = bfv.rotate_columns(ct, s, evaluation_key)
    return ct


def rotate_columns_and_sum(cts: list, step: int, evaluation_key):
    """acc = ((ct_k rotated + ct_{k-1}) rotated + ...) (Extras:113-133)."""
    cts = list(cts)
    acc = cts.pop()
    for ct in reversed(cts):
        acc = rotate_columns_multi_step(acc, step, evaluation_key)
        acc = bfv.ct_add(acc, ct)
    return acc


def swap_rows_and_add(swapping, adding_to, evaluation_key):
    return bfv.ct_add(bfv.swap_rows(swapping, evaluation_key), adding_to)


# ---------------------------------------------------------------------------
# BSGS matmul (MatrixMultiplication.swift:131-299)
# ---------------------------------------------------------------------------


def matmul_evaluation_key_config(
    context, plaintext_dims: MatrixDimensions, max_query_count: int
) -> keys.EvaluationKeyConfig:
    _, simd_cols = _simd_dims(context)
    n = context.degree
    bsgs = BabyStepGiantStep.create(plaintext_dims.column_count)
    elements = [
        galoismod.rotating_columns_element(-1, n),
        galoismod.rotating_columns_element(-bsgs.baby_step, n),
        galoismod.swapping_rows_element(n),
    ]
    if simd_cols // plaintext_dims.row_count > 1:
        elements.append(galoismod.rotating_columns_element(1, n))
        if simd_cols > 16:
            elements.append(galoismod.rotating_columns_element(16, n))
        if simd_cols > 256:
            elements.append(galoismod.rotating_columns_element(256, n))
    config = keys.EvaluationKeyConfig(tuple(dict.fromkeys(elements)), False)
    dense_row_config = CiphertextMatrix.extract_dense_row_config(
        context, MatrixDimensions(max_query_count, plaintext_dims.column_count)
    )
    return config.union(dense_row_config)


def mul_transpose_vector(pt_matrix: PlaintextMatrix, ct_vector: CiphertextMatrix, evaluation_key):
    """plaintextMatrix @ vector^T -> list of canonical ciphertexts."""
    if pt_matrix.packing.kind != "diagonal":
        raise errors.PnnsError("mulTranspose requires diagonal packing")
    if ct_vector.packing.kind != "denseRow" or ct_vector.row_count != 1:
        raise errors.PnnsError("vector must be 1-row denseRow")
    bsgs = pt_matrix.packing.bsgs
    context = pt_matrix.context
    n = context.degree

    rotated_states = []
    state = ct_vector.ciphertexts[0]
    for step in range(bsgs.baby_step):
        rotated_states.append(state)
        if step != bsgs.baby_step - 1:
            state = bfv.rotate_columns(state, -1, evaluation_key)
    rotated_eval = [bfv.ct_to_eval(c) for c in rotated_states]

    result_ct_count = -(-pt_matrix.row_count // n)
    results = []
    for result_index in range(result_ct_count):
        inner_products = []
        for giant in range(bsgs.giant_step):
            pt_count = min(len(rotated_eval), bsgs.vector_dimension - bsgs.baby_step * giant)
            row_indices = [
                result_ct_count * (j + bsgs.baby_step * giant) + result_index
                for j in range(pt_count)
            ]
            pt_rows = [
                bfv.plaintext_to_eval(context, pt_matrix.plaintexts[i]) for i in row_indices
            ]
            prod = bfv.inner_product_ct_pt(rotated_eval[: len(pt_rows)], pt_rows)
            inner_products.append(bfv.ct_to_coeff(prod))
        results.append(
            rotate_columns_and_sum(inner_products, -bsgs.baby_step, evaluation_key)
        )
    return results


def mul_transpose_matrix(pt_matrix: PlaintextMatrix, ct_matrix: CiphertextMatrix, evaluation_key):
    """plaintextMatrix @ ciphertextMatrix^T -> denseColumn CiphertextMatrix."""
    if pt_matrix.column_count != ct_matrix.column_count:
        raise errors.PnnsError("column count mismatch")
    context = pt_matrix.context
    simd_rows, simd_cols = _simd_dims(context)
    inner_products = []
    for row_index in range(ct_matrix.row_count):
        row = ct_matrix.extract_dense_row(row_index, evaluation_key)
        inner_products.extend(mul_transpose_vector(pt_matrix, row, evaluation_key))
    cols_per_simd_row = simd_cols // pt_matrix.row_count
    if cols_per_simd_row > 0:
        cols_per_ct = simd_rows * cols_per_simd_row
        packed = []
        for start in range(0, len(inner_products), cols_per_ct):
            group = inner_products[start : start + cols_per_ct]
            packed_rows = []
            for s in range(0, len(group), cols_per_simd_row):
                packed_rows.append(
                    rotate_columns_and_sum(
                        group[s : s + cols_per_simd_row], pt_matrix.row_count, evaluation_key
                    )
                )
            if len(group) > cols_per_simd_row:
                packed.append(swap_rows_and_add(packed_rows[1], packed_rows[0], evaluation_key))
            else:
                packed.append(packed_rows[0])
        inner_products = packed
    return CiphertextMatrix(
        MatrixDimensions(pt_matrix.row_count, ct_matrix.row_count),
        MatrixPacking.dense_column(),
        inner_products,
        context,
    )


# ---------------------------------------------------------------------------
# Client / Server (Client.swift, Server.swift, Config.swift)
# ---------------------------------------------------------------------------


def normalized_scaled_and_rounded(vectors: np.ndarray, scaling_factor: float) -> np.ndarray:
    """L2-normalize rows, scale, round to nearest int (PNNS Util.swift:75-90).
    Float32 arithmetic to match the reference."""
    v = vectors.astype(np.float32)
    norms = np.sqrt((v * v).sum(axis=1, dtype=np.float32))
    out = np.zeros(v.shape, dtype=np.int64)
    nz = norms != 0
    scaled = (v[nz] * np.float32(scaling_factor)) / norms[nz][:, None]
    out[nz] = np.round(scaled).astype(np.int64)
    return out


def max_scaling_factor(vector_dimension: int, plaintext_moduli: list[int]) -> int:
    t = np.float32(1)
    for m in plaintext_moduli:
        t = t * np.float32(m)
    return int(np.floor(np.sqrt((t - 1) / 2) - np.sqrt(np.float32(vector_dimension)) / 2))


@dataclass(frozen=True)
class ClientConfig:
    encryption_parameters: tuple  # one per plaintext modulus
    scaling_factor: int
    query_packing: MatrixPacking
    vector_dimension: int
    evaluation_key_config: keys.EvaluationKeyConfig
    distance_metric: DistanceMetric = DistanceMetric.COSINE_SIMILARITY
    extra_plaintext_moduli: tuple = ()

    @property
    def plaintext_moduli(self):
        return [p.plaintext_modulus for p in self.encryption_parameters]

    @classmethod
    def create(cls, encryption_parameters, scaling_factor, query_packing, vector_dimension,
               evaluation_key_config, distance_metric=DistanceMetric.COSINE_SIMILARITY,
               extra_plaintext_moduli=()):
        from .. import params as paramsmod

        extra = tuple(
            paramsmod.EncryptionParameters(
                poly_degree=encryption_parameters.poly_degree,
                plaintext_modulus=t,
                coefficient_moduli=encryption_parameters.coefficient_moduli,
                error_std_dev=encryption_parameters.error_std_dev,
                security_level=encryption_parameters.security_level,
                scalar_bits=encryption_parameters.scalar_bits,
            )
            for t in extra_plaintext_moduli
        )
        return cls(
            (encryption_parameters,) + extra,
            scaling_factor,
            query_packing,
            vector_dimension,
            evaluation_key_config,
            distance_metric,
            tuple(extra_plaintext_moduli),
        )


@dataclass(frozen=True)
class ServerConfig:
    client_config: ClientConfig
    database_packing: MatrixPacking

    @property
    def distance_metric(self):
        return self.client_config.distance_metric

    @property
    def vector_dimension(self):
        return self.client_config.vector_dimension

    @property
    def encryption_parameters(self):
        return self.client_config.encryption_parameters


@dataclass
class Query:
    ciphertext_matrices: list  # one CiphertextMatrix per plaintext modulus


@dataclass
class Response:
    ciphertext_matrices: list
    entry_ids: list
    entry_metadatas: list

    def noise_budget(self, secret_key) -> float:
        return min(m.noise_budget(secret_key) for m in self.ciphertext_matrices)


@dataclass
class DatabaseRow:
    entry_id: int
    entry_metadata: bytes
    vector: np.ndarray  # float


@dataclass
class Database:
    rows: list


@dataclass
class ProcessedDatabase:
    contexts: list
    plaintext_matrices: list  # Eval PlaintextMatrix per modulus
    entry_ids: list
    entry_metadatas: list
    server_config: ServerConfig


def process_database(database: Database, config: ServerConfig) -> ProcessedDatabase:
    """ProcessedDatabase.swift:185-230."""
    if config.distance_metric != DistanceMetric.COSINE_SIMILARITY:
        raise errors.PnnsError("only cosineSimilarity supported")
    contexts = [bfv.get_bfv_context(ep) for ep in config.encryption_parameters]
    vectors = np.stack([row.vector for row in database.rows])
    rounded = normalized_scaled_and_rounded(vectors, float(config.client_config.scaling_factor))
    dims = MatrixDimensions(*rounded.shape)
    should_reduce = len(contexts) > 1
    matrices = []
    for ctx in contexts:
        m = PlaintextMatrix.from_signed_values(
            ctx, dims, config.database_packing, [int(v) for v in rounded.reshape(-1)],
            reduce=should_reduce,
        )
        matrices.append(m.to_eval())
    has_metadata = any(row.entry_metadata for row in database.rows)
    return ProcessedDatabase(
        contexts,
        matrices,
        [row.entry_id for row in database.rows],
        [row.entry_metadata for row in database.rows] if has_metadata else [],
        config,
    )


class Client:
    def __init__(self, config: ClientConfig):
        self.config = config
        self.contexts = [bfv.get_bfv_context(ep) for ep in config.encryption_parameters]

    def generate_secret_key(self, rng=None):
        return bfv.generate_secret_key(self.contexts[0], rng)

    def generate_evaluation_key(self, secret_key, err_rng=None):
        return keys.generate_evaluation_key(
            self.contexts[0], self.config.evaluation_key_config, secret_key, err_rng
        )

    def generate_query(self, vectors: np.ndarray, secret_key, err_rng=None) -> Query:
        rounded = normalized_scaled_and_rounded(vectors, float(self.config.scaling_factor))
        dims = MatrixDimensions(*rounded.shape)
        should_reduce = len(self.contexts) > 1
        matrices = []
        for ctx in self.contexts:
            m = PlaintextMatrix.from_signed_values(
                ctx, dims, self.config.query_packing, [int(v) for v in rounded.reshape(-1)],
                reduce=should_reduce,
            )
            matrices.append(m.encrypt(secret_key, err_rng=err_rng).to_coeff())
        return Query(matrices)

    def decrypt(self, response: Response, secret_key):
        """-> (distances [query_count?], entry_ids, metadatas); distances as
        float32 row-major [db_rows x queries] per reference denseColumn."""
        dims = response.ciphertext_matrices[0].dimensions
        decoded = [
            m.decrypt(secret_key).unpack() for m in response.ciphertext_matrices
        ]
        moduli = [ctx.plaintext_modulus for ctx in self.contexts]
        T = math.prod(moduli)
        composed = []
        for i in range(len(decoded[0])):
            x = 0
            for j, t in enumerate(moduli):
                gi = T // t
                x += (decoded[j][i] * nt.inverse_mod(gi % t, t) % t) * gi
            composed.append(x % T)
        sf = np.float32(self.config.scaling_factor)
        distances = np.array(
            [
                np.float32(v - T if v > (T - 1) // 2 else v) / (sf * sf)
                for v in composed
            ],
            dtype=np.float32,
        ).reshape(dims.row_count, dims.column_count)
        return distances, response.entry_ids, response.entry_metadatas


class Server:
    def __init__(self, database: ProcessedDatabase):
        if database.server_config.distance_metric != DistanceMetric.COSINE_SIMILARITY:
            raise errors.PnnsError("only cosineSimilarity supported")
        self.database = database

    def compute_response(self, query: Query, evaluation_key) -> Response:
        if len(query.ciphertext_matrices) != len(self.database.plaintext_matrices):
            raise errors.PnnsError("query matrix count mismatch")
        out = []
        for ct_matrix, pt_matrix in zip(query.ciphertext_matrices, self.database.plaintext_matrices):
            result = mul_transpose_matrix(pt_matrix, ct_matrix.to_coeff(), evaluation_key)
            result = result.mod_switch_down_to_single().to_coeff()
            out.append(result)
        return Response(out, self.database.entry_ids, self.database.entry_metadatas)


@dataclass
class DatabaseValidationResult:
    """Self-check metrics for a processed PNNS database, the analogue of the
    reference's ProcessedDatabaseWithParameters.validate
    (PrivateNearestNeighborSearch/ProcessedDatabase.swift:93-160)."""

    query_time_s: float
    response_time_s: float
    decrypt_time_s: float
    noise_budget: float
    max_abs_error: float


def validate_database(
    processed: ProcessedDatabase, trials: int = 1, n_queries: int = 1
) -> DatabaseValidationResult:
    """Run fresh-key query/response/decrypt trials against the plaintext
    cosine-similarity reference; returns the min times across trials (the
    reference reports the fastest trial) and the worst-case decode error."""
    import time

    config = processed.server_config.client_config
    client = Client(config)
    server = Server(processed)
    best_q = best_r = best_d = float("inf")
    worst_err = 0.0
    budget = float("inf")
    rng = np.random.default_rng(0)
    for _ in range(max(1, trials)):
        # fresh keys per trial, matching ProcessedDatabase.swift:112-114
        sk = client.generate_secret_key()
        ek = client.generate_evaluation_key(sk)
        qvecs = rng.standard_normal((n_queries, config.vector_dimension)).astype(
            np.float32
        )
        t0 = time.perf_counter()
        query = client.generate_query(qvecs, sk)
        best_q = min(best_q, time.perf_counter() - t0)
        t0 = time.perf_counter()
        response = server.compute_response(query, ek)
        best_r = min(best_r, time.perf_counter() - t0)
        t0 = time.perf_counter()
        distances, _, _ = client.decrypt(response, sk)
        best_d = min(best_d, time.perf_counter() - t0)
        budget = min(budget, response.noise_budget(sk))
        # fixed-point reference (PNNS Util.swift:142-155): distances from
        # the *rounded* database rows and rounded query, both scaled.
        sf = float(config.scaling_factor)
        qr = normalized_scaled_and_rounded(qvecs, sf)
        db_rounded = _rounded_rows(processed)
        expected = (db_rounded @ qr.T).astype(np.float64) / (sf * sf)
        err = float(np.max(np.abs(expected - distances.astype(np.float64))))
        worst_err = max(worst_err, err)
    return DatabaseValidationResult(best_q, best_r, best_d, budget, worst_err)


def _rounded_rows(processed: ProcessedDatabase) -> np.ndarray:
    """Recover the signed fixed-point database rows from the first plaintext
    matrix (exact CRT recompose across plaintext moduli)."""
    moduli = [ctx.plaintext_modulus for ctx in processed.contexts]
    T = math.prod(moduli)
    unpacked = [m.unpack() for m in processed.plaintext_matrices]
    vals = []
    for i in range(len(unpacked[0])):
        x = 0
        for j, t in enumerate(moduli):
            gi = T // t
            x += (unpacked[j][i] * nt.inverse_mod(gi % t, t) % t) * gi
        x %= T
        vals.append(x - T if x > (T - 1) // 2 else x)
    dims = processed.plaintext_matrices[0].dimensions
    return np.array(vals, dtype=np.int64).reshape(dims.row_count, dims.column_count)

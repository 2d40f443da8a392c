"""TPU-batched PNNS serving: stacked BSGS matrix-vector products.

The reference evaluates the Halevi-Shoup baby-step/giant-step product with
per-plaintext multiplies inside task groups (MatrixMultiplication.swift:
131-299). Here the whole giant-step accumulation is one stacked tensor MAC:
the diagonal plaintext matrix packs into a dense [G, J, R, L, N] limb tensor
(G giant steps, J baby steps, R result ciphertexts) and, for a batch of
queries, every (g, r) inner product over j computes in one vectorized
multiply + lazy double-width reduction — the same kernel shape as the PIR
dim-0 MAC. Rotations (baby-step prep and giant-step accumulation) are
batched over the query axis.

Both scalar widths are served: w32 as one fused jit per (config, batch);
the 2-limb w64 path as eager vmap by default (SHE_TPU_W64_FUSED_SERVING=1
opts into the fused program, as in PIR serving).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


from ..bfv import bfv
from ..core import poly as polymod
from ..core.poly import COEFF, EVAL, PolyRq
from ..pir import serving as pir_serving
from . import pnns


def pack_diagonal_matrix(matrix: "pnns.PlaintextMatrix", ct_ctx) -> np.ndarray:
    """Diagonal-packed PlaintextMatrix (Eval) -> dense [G, J, R, W, L, N]
    u32 limb tensor. Missing baby steps in the last giant step are zeros."""
    bsgs = matrix.packing.bsgs
    G, J = bsgs.giant_step, bsgs.baby_step
    n = ct_ctx.degree
    R = -(-matrix.row_count // n)
    W = ct_ctx.nlimbs
    L = len(ct_ctx.moduli)
    out = np.zeros((G, J, R, W, L, n), dtype=np.uint32)
    for g in range(G):
        pt_count = min(J, bsgs.vector_dimension - J * g)
        for j in range(pt_count):
            for r in range(R):
                idx = R * (j + J * g) + r
                pt = matrix.plaintexts[idx]
                out[g, j, r] = np.asarray(pt.poly.data)
    return out


def bsgs_inner_products(db, rotated_eval, ct_ctx):
    """db [G, J, R, W, L, N]; rotated_eval [J, 2, W, L, N] (eval query
    rotations) -> [G, R, 2, W, L, N] reduced ct-pt inner products over the
    J axis (both scalar widths, same lazy schedules as the PIR dim-0 MAC)."""
    if ct_ctx.nlimbs == 2:
        return _bsgs_inner_products_w64(db, rotated_eval, ct_ctx)
    assert ct_ctx.nlimbs == 1
    J = db.shape[1]
    cap = max(1, ct_ctx.max_lazy_product_accumulation_count() // 2)
    total = None
    for start in range(0, J, cap):
        acc_lo, acc_hi = _pt_mul(db[:, start, :, 0], rotated_eval[start, :, 0])
        for j in range(start + 1, min(start + cap, J)):
            lo_j, hi_j = _pt_mul(db[:, j, :, 0], rotated_eval[j, :, 0])
            s = acc_lo + lo_j
            carry = (s < acc_lo).astype(jnp.uint32)
            acc_lo = s
            acc_hi = acc_hi + hi_j + carry
        red = pir_serving._reduce_u64_rows(acc_lo, acc_hi, ct_ctx)
        total = red if total is None else pir_serving._add_mod_rows(total, red, ct_ctx)
    return total[:, :, :, None]  # restore W axis


def _bsgs_inner_products_w64(db, rotated_eval, ct_ctx):
    """2-limb variant: 128-bit lazy MAC limbs with periodic exact reduction
    (same schedule as the PIR _dim0_inner_products_w64)."""
    from ..ops import limb
    from ..ops import word as wordmod

    J = db.shape[1]
    cap = max(1, ct_ctx.max_lazy_product_accumulation_count() // 2)
    total = None  # word tuple of [G, R, 2, L, N]
    for start in range(0, J, cap):
        acc = None
        for j in range(start, min(start + cap, J)):
            dw = (db[:, j, :, None, 0], db[:, j, :, None, 1])  # [G, R, 1, L, N]
            qw = (rotated_eval[j, :, 0], rotated_eval[j, :, 1])  # [2, L, N]
            term = limb.mul64(dw, qw)
            acc = term if acc is None else limb.add128(acc, term)
        red = pir_serving._reduce_u128_rows(acc, ct_ctx)
        total = (
            red
            if total is None
            else wordmod.W64.add_mod(total, red, pir_serving._q_word_cols(ct_ctx))
        )
    return jnp.stack(total, axis=3)  # [G, R, 2, W=2, L, N]


def _pt_mul(db_gj, q_j):
    """db_gj [G, R, L, N] x q_j [2, L, N] -> 64-bit products
    [G, R, 2, L, N]."""
    from ..ops import limb

    return limb.mul32(db_gj[:, :, None], q_j[None, None])


class _StagedPnnsResponder:
    """w64 TPU path: a pipeline of small cached jits (per-rotation, BSGS
    MAC, per-giant-step rotate-and-sum, finalize) instead of one fused
    program — XLA compile time stays linear in pipeline depth, mirroring
    pir.serving._StagedResponder (same stage boundaries as the reference's
    mulTranspose phases, MatrixMultiplication.swift:131-299)."""

    def __init__(self, server: "BatchedPnnsServer"):
        self.server = server
        self._jits: dict = {}

    def _stage(self, key, make):
        if key not in self._jits:
            self._jits[key] = jax.jit(make())
        return self._jits[key]

    def respond(self, stacked, evaluation_key, B):
        return [
            self._respond_matrix(mi, stacked[mi], evaluation_key)
            for mi in range(len(self.server.packed))
        ]

    def _respond_matrix(self, mi: int, arr, ek):
        """arr: [B, 2, W, L, N]. Three jits per matrix (rotation chain, BSGS
        MAC, rotate-and-sum + finalize) — all loops run INSIDE the jits so
        the host dispatch count per batch stays constant (the tunnel costs
        ~1 ms per dispatch; see pir.serving._StagedResponder)."""
        server = self.server
        ctx = server.contexts[mi]
        ct_ctx = ctx.ciphertext_context
        matrix = server.database.plaintext_matrices[mi]
        bsgs = matrix.packing.bsgs
        J = bsgs.baby_step

        def mk_ct(a, fmt=COEFF):
            return bfv.Ciphertext(
                ctx, [PolyRq(a[p], ct_ctx, fmt) for p in range(a.shape[0])]
            )

        def stack_polys(ct):
            return jnp.stack([p.data for p in ct.polys])

        def rotations_one(a, ek):  # [2, W, L, N] -> [J, 2, W, L, N] eval
            state = mk_ct(a)
            rotated = []
            for step in range(J):
                rotated.append(stack_polys(bfv.ct_to_eval(state)))
                if step != J - 1:
                    state = bfv.rotate_columns(state, -1, ek)
            return jnp.stack(rotated)

        rotations = self._stage(
            ("pnns_rot", mi, J),
            lambda: jax.vmap(rotations_one, in_axes=(0, None), out_axes=1),
        )
        rotated_eval = rotations(arr, ek)  # [J, B, 2, W, L, N]

        def mac_one(rot_eval):  # [J, 2, W, L, N] for one query
            prods = bsgs_inner_products(server.packed[mi], rot_eval, ct_ctx)
            G, R = prods.shape[0], prods.shape[1]
            return jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    polymod.inverse_ntt(
                                        PolyRq(prods[g, r, p], ct_ctx, EVAL)
                                    ).data
                                    for p in range(2)
                                ]
                            )
                            for r in range(R)
                        ]
                    )
                    for g in range(G)
                ]
            )  # [G, R, 2, W, L, N] coeff

        mac = self._stage(
            ("pnns_mac", mi), lambda: jax.vmap(mac_one, in_axes=1, out_axes=0)
        )
        per_giant = mac(rotated_eval)  # [B, G, R, polys, W, L, N]
        G, R = per_giant.shape[1], per_giant.shape[2]

        def rotsum_fin_one(giants, ek):  # [G, R, polys, W, L, N] one query
            outs = []
            for r in range(R):
                acc = mk_ct(giants[G - 1, r])
                for g in reversed(range(G - 1)):
                    acc = bfv.ct_add(
                        pnns.rotate_columns_multi_step(acc, -J, ek),
                        mk_ct(giants[g, r]),
                    )
                out = bfv.ct_to_coeff(bfv.mod_switch_down_to_single(acc))
                outs.append(stack_polys(out))
            return jnp.stack(outs)  # [R, polys, W, L, N]

        rotsum_fin = self._stage(
            ("pnns_rotsum_fin", mi, J, G, R),
            lambda: jax.vmap(rotsum_fin_one, in_axes=(0, None)),
        )
        out = rotsum_fin(per_giant, ek)  # [B, R, polys, W, L, N]
        return [out[:, r] for r in range(R)]


class BatchedPnnsServer:
    """Serves query batches; one jitted program per batch size."""

    def __init__(self, database: "pnns.ProcessedDatabase"):
        self.database = database
        self.config = database.server_config
        self.contexts = database.contexts
        self.packed = [
            jnp.asarray(pack_diagonal_matrix(m, ctx.ciphertext_context))
            for m, ctx in zip(database.plaintext_matrices, self.contexts)
        ]
        self._jit = {}
        self._staged = None

    def _respond_one_matrix(self, mi: int, query_ct, evaluation_key):
        """query_ct: 1-row denseRow ciphertext (canonical); returns list of
        R canonical result ciphertexts for matrix mi."""
        ctx = self.contexts[mi]
        matrix = self.database.plaintext_matrices[mi]
        bsgs = matrix.packing.bsgs
        J = bsgs.baby_step
        state = query_ct
        rotated = []
        for step in range(J):
            rotated.append(bfv.ct_to_eval(state))
            if step != J - 1:
                state = bfv.rotate_columns(state, -1, evaluation_key)
        rotated_eval = jnp.stack(
            [jnp.stack([c.polys[0].data, c.polys[1].data]) for c in rotated]
        )  # [J, 2, W, L, N]
        prods = bsgs_inner_products(self.packed[mi], rotated_eval, ctx.ciphertext_context)
        # prods [G, R, 2, W, L, N] -> per (g, r) canonical cts, then
        # rotate-and-sum over g with step -babyStep
        G, R = prods.shape[0], prods.shape[1]
        results = []
        for r in range(R):
            per_giant = [
                bfv.Ciphertext(
                    ctx,
                    [
                        polymod.inverse_ntt(
                            PolyRq(prods[g, r, p], ctx.ciphertext_context, EVAL)
                        )
                        for p in range(2)
                    ],
                )
                for g in range(G)
            ]
            results.append(
                pnns.rotate_columns_and_sum(per_giant, -J, evaluation_key)
            )
        return results

    @staticmethod
    def stack_queries(queries: list) -> list:
        """Stack a list of pnns.Query into per-CRT-modulus [B, 2, W, L, N]
        tensors."""
        n_matrices = len(queries[0].ciphertext_matrices)
        return [
            jnp.stack(
                [
                    jnp.stack(
                        [p.data for p in q.ciphertext_matrices[mi].ciphertexts[0].polys]
                    )
                    for q in queries
                ]
            )
            for mi in range(n_matrices)
        ]

    def stack_queries_device(self, queries: list) -> list:
        """stack_queries as ONE cached jitted dispatch (see
        pir.serving.BatchedMulPirServer.stack_queries_device — the eager
        per-query stacks dominate end-to-end latency through the tunnel)."""
        import jax

        n_matrices = len(queries[0].ciphertext_matrices)
        n_polys = len(queries[0].ciphertext_matrices[0].ciphertexts[0].polys)
        B = len(queries)
        key = (B, n_matrices, n_polys)
        jits = self.__dict__.setdefault("_stack_jits", {})
        if key not in jits:

            def stk(flat):
                out = []
                for mi in range(n_matrices):
                    per_q = []
                    for b in range(B):
                        base = (b * n_matrices + mi) * n_polys
                        per_q.append(jnp.stack(flat[base : base + n_polys]))
                    out.append(jnp.stack(per_q))
                return out

            jits[key] = jax.jit(stk)
        flat = [
            p.data
            for q in queries
            for m in q.ciphertext_matrices
            for p in m.ciphertexts[0].polys
        ]
        return jits[key](flat)

    def compute_response_batch(self, queries: list, evaluation_key) -> list:
        """queries: list of pnns.Query (single-row query matrices)."""
        stacked = self.stack_queries_device(queries)
        return self.compute_response_batch_from_stacked(
            stacked, evaluation_key, len(queries)
        )

    def compute_response_stream(self, batches: list, evaluation_key) -> list:
        """Pipelined end-to-end serving over query batches (assembly of
        batch i-1 overlaps batch i's async device compute)."""
        pending = None
        results = []
        for queries in batches:
            B = len(queries)
            stacked = self.stack_queries_device(queries)
            out = self._respond_arrays(stacked, evaluation_key, B)
            if pending is not None:
                results.extend(self._assemble_responses(*pending))
            pending = (out, B)
        if pending is not None:
            results.extend(self._assemble_responses(*pending))
        return results

    def compute_response_batch_from_stacked(self, stacked, evaluation_key, B):
        """stacked: [n_matrices] list of [B, 2, W, L, N] (possibly sharded
        over a mesh axis on the query-batch dimension).

        w64 serving mode mirrors the PIR policy (pir/serving.py): on
        accelerator backends the 2-limb batch runs as a staged pipeline of
        small cached jits; off-TPU it runs as eager vmap (XLA:CPU's backend
        is superlinear compiling the u128 stage programs);
        SHE_TPU_W64_FUSED_SERVING=1 opts into the single fused jit for
        long-running deployments where the one-time disk-cached compile
        amortizes."""
        import os

        out = self._respond_arrays(stacked, evaluation_key, B)
        return self._assemble_responses(out, B)

    def _respond_arrays(self, stacked, evaluation_key, B):
        """Raw response arrays (per matrix, per result ct, [B, polys, W, L, N])
        without host assembly — the serving core."""
        import os

        n_matrices = len(self.packed)
        w64 = any(c.ciphertext_context.nlimbs == 2 for c in self.contexts)
        fused_override = os.environ.get("SHE_TPU_W64_FUSED_SERVING") == "1"
        staged = (
            w64 and not fused_override and jax.default_backend() != "cpu"
        ) or os.environ.get("SHE_TPU_STAGED_SERVING") == "1"
        if staged:
            if self._staged is None:
                self._staged = _StagedPnnsResponder(self)
            return self._staged.respond(stacked, evaluation_key, B)
        fused = (not w64) or fused_override
        key = (B, n_matrices, fused)
        if key not in self._jit:

            def run(stacked, ek):
                # stacked: [n_matrices] list of [B, 2, W, L, N]
                def one(per_query):
                    out = []
                    for mi in range(n_matrices):
                        ctx = self.contexts[mi]
                        ct = bfv.Ciphertext(
                            ctx,
                            [
                                PolyRq(per_query[mi][p], ctx.ciphertext_context, COEFF)
                                for p in range(2)
                            ],
                        )
                        results = self._respond_one_matrix(mi, ct, ek)
                        singles = [
                            bfv.ct_to_coeff(bfv.mod_switch_down_to_single(c))
                            for c in results
                        ]
                        out.append(
                            [jnp.stack([p.data for p in c.polys]) for c in singles]
                        )
                    return out

                return jax.vmap(one)(stacked)

            self._jit[key] = jax.jit(run) if fused else run
        return self._jit[key](stacked, evaluation_key)

    def _unbind_batch(self, arr):
        """[B, polys, ...] -> B x polys nested tuples in ONE jitted dispatch
        (see pir.serving.BatchedMulPirServer._unbind_batch)."""
        import jax

        B, P = arr.shape[0], arr.shape[1]
        jits = self.__dict__.setdefault("_unbind_jits", {})
        if (B, P) not in jits:
            jits[(B, P)] = jax.jit(
                lambda a: tuple(
                    tuple(a[b, p] for p in range(P)) for b in range(B)
                )
            )
        return jits[(B, P)](arr)

    def _assemble_responses(self, out, B: int) -> list:
        """out: per matrix, per result ct, [B, polys, W, L, N] arrays."""
        n_matrices = len(self.packed)
        responses = []
        unbound = [
            [self._unbind_batch(arrs) for arrs in out[mi]]
            for mi in range(n_matrices)
        ]
        for b in range(B):
            matrices = []
            for mi in range(n_matrices):
                ctx = self.contexts[mi]
                single_ctx = ctx.ciphertext_context.get_context(1)
                cts = [
                    bfv.Ciphertext(
                        ctx,
                        [PolyRq(p, single_ctx, COEFF) for p in parts[b]],
                    )
                    for parts in unbound[mi]
                ]
                dims = pnns.MatrixDimensions(
                    self.database.plaintext_matrices[mi].row_count, 1
                )
                matrices.append(
                    pnns.CiphertextMatrix(
                        dims, pnns.MatrixPacking.dense_column(), cts, ctx
                    )
                )
            responses.append(
                pnns.Response(
                    matrices, self.database.entry_ids, self.database.entry_metadatas
                )
            )
        return responses

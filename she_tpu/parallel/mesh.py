"""Multi-chip sharded PIR/PNNS serving over a jax device mesh.

The reference has no distributed backend (SURVEY §2.8): its parallelism is
in-process task groups plus offline data sharding. The TPU-native scaling
story built here:

* **Query-batch data parallelism** (`batch_parallel_response`): the batched
  serving pipeline is embarrassingly parallel over the query axis; sharding
  the stacked query tensors over a mesh axis lets XLA SPMD partition the
  whole program with zero manual collectives. This is the production-scaling
  axis (queries/sec scales linearly in chips over ICI).
* **Database partitioning** (`dim0_partial_psum`): one shard's dim-0
  hyper-row axis is partitioned across devices; each device computes partial
  ciphertext-plaintext inner products over its d0 slice and the partials
  reduce across the 'db' axis. When the u32 sum cannot overflow (w32 with
  S*q < 2^32) this is a single `psum` + fold; otherwise (w64, or many
  devices) it is a recursive-doubling `ppermute` butterfly of exact modular
  adds — bit-identical to the single-device result for both widths.
* **Sharded-polynomial / sharded-limb ops** live in `parallel.sharded`:
  the N axis of a polynomial sharded across devices with per-NTT-stage
  ppermute butterfly exchanges over ICI, and an RNS-limb axis for
  L-parallel ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import errors
from ..ops import word as wordmod
from ..pir import serving


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def _check_batch_divisible(B: int, mesh: Mesh) -> None:
    if B % mesh.devices.size != 0:
        raise errors.InvalidArgument(
            f"mesh size {mesh.devices.size} must divide the query batch {B}"
        )


def batch_parallel_response(server: "serving.BatchedMulPirServer", queries, evaluation_key, mesh: Mesh):
    """Shard the query batch across the mesh; XLA partitions the pipeline.

    The mesh axis size must divide len(queries).
    """
    axis = mesh.axis_names[0]
    B = len(queries)
    _check_batch_divisible(B, mesh)
    stacked, n_ct, indices_count = server.stack_queries(queries)
    sharding = NamedSharding(mesh, P(axis))
    stacked = [jax.device_put(s, sharding) for s in stacked]
    # delegate to the cached jitted program; XLA propagates the sharding
    return server.compute_response_batch_from_stacked(
        stacked, evaluation_key, B, n_ct, indices_count
    )


def dim0_partial_psum(db_chunk, query_eval, ct_ctx, mesh: Mesh, axis: str = "db"):
    """Database-partitioned dim-0 inner products with a cross-device
    reduction.

    db_chunk [C, d0, W, L, N] is partitioned on d0 across `axis`; returns
    the same [C, 2, W, L, N] result as serving.dim0_inner_products,
    bit-exactly, for both scalar widths.
    """
    S = mesh.shape[axis]
    d0 = db_chunk.shape[1]
    if d0 % S != 0:
        raise errors.InvalidArgument(f"mesh axis size {S} must divide d0={d0}")
    W = ct_ctx.nlimbs
    max_q = max(ct_ctx.moduli)
    fast_u32 = W == 1 and S * max_q < (1 << 32)
    q_col = jnp.asarray(ct_ctx.q_arr)[0, :, 0][:, None]  # [L, 1] limb 0
    q_word = tuple(jnp.asarray(ct_ctx.q_arr)[l, :, 0][:, None] for l in range(W))
    word_cls = wordmod.W32 if W == 1 else wordmod.W64

    def local(db_local, q_local):
        partial = serving.dim0_inner_products(db_local, q_local, ct_ctx)
        if fast_u32:
            # partial in [0, q); sum of S residues stays < S*q < 2^32
            summed = jax.lax.psum(partial, axis)
            # fold back to [0, q): up to S-1 multiples of q
            r = summed
            for _ in range(max(1, S - 1)):
                r = jnp.minimum(r, r - q_col)
            return r
        # generic exact path: recursive-doubling butterfly of modular adds.
        # Every device ends with the full sum; each add is exact in [0, q),
        # so no width/overflow constraints apply (w64-safe).
        w = tuple(partial[:, :, l] for l in range(W))
        step = 1
        while step < S:
            perm = [(s, s ^ step) for s in range(S)]
            recv = tuple(
                jax.lax.ppermute(a, axis_name=axis, perm=perm) for a in w
            )
            w = word_cls.add_mod(w, recv, q_word)
            step <<= 1
        return jnp.stack(w, axis=2)  # [C, 2, W, L, N]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(None),
        check_vma=False,
    )(db_chunk, query_eval)


def two_axis_response(
    server: "serving.BatchedMulPirServer", queries, evaluation_key, mesh: Mesh
):
    """Full MulPIR serving as ONE shard_map program on a 2-axis
    (batch, db) mesh — the shape a real v5e-8 deployment runs (SURVEY
    §2.8/§7.1; the reference's data-sharding analogue is
    KeywordDatabase.swift:152-268).

    Axis roles:
    * ``batch``: the query batch is data-parallel — each batch shard runs
      the whole pipeline on B/S_b queries.
    * ``db``: tensor parallelism over the database contraction axes —
      the dim-0 hyper-rows are partitioned (each device MACs its d0/S_d
      slice, partials combine with an exact ppermute butterfly of modular
      adds), and the higher-dimension BEHZ ct-ct inner product partitions
      its terms (each device lifts+multiplies dim_size/S_d pairs and the
      extended-base accumulators butterfly-combine BEFORE the single
      dropExtendedBase). Oblivious expansion has no database dependence
      and is replicated across ``db`` (its cost amortizes over the batch
      axis instead).

    Bit-identical to the single-device server for both scalar widths: all
    cross-device combines are exact modular adds in a fixed order.
    Returns the same per-query-index/per-chunk response arrays as
    ``BatchedMulPirServer._respond_arrays``.
    """
    from ..bfv import bfv
    from ..core import poly as polymod
    from ..core.poly import COEFF, EVAL, PolyRq

    baxis, daxis = mesh.axis_names
    Sb, Sd = mesh.shape[baxis], mesh.shape[daxis]
    B = len(queries)
    if B % Sb != 0:
        raise errors.InvalidArgument(f"batch axis {Sb} must divide B={B}")
    parameter = server.parameter
    d0 = parameter.dimensions[0]
    if d0 % Sd != 0:
        raise errors.InvalidArgument(f"db axis {Sd} must divide d0={d0}")
    for dim_size in parameter.dimensions[1:]:
        if dim_size % Sd != 0:
            raise errors.InvalidArgument(
                f"db axis {Sd} must divide higher dim {dim_size}"
            )
    stacked, n_ct, indices_count = server.stack_queries(queries)
    if indices_count != 1:
        raise errors.InvalidArgument("two_axis_response serves 1 index per query")
    ct_ctx = server.ct_ctx
    W = ct_ctx.nlimbs
    context = server.context
    chunks_arr = jnp.stack(server.chunks[0])  # [n_chunks, C, d0, W, L, N]
    n_chunks = chunks_arr.shape[0]
    d0_local = d0 // Sd

    def _butterfly_word(w, q_word, axis, word_cls):
        S = mesh.shape[axis]
        step = 1
        while step < S:
            perm = [(s, s ^ step) for s in range(S)]
            recv = tuple(
                jax.lax.ppermute(a, axis_name=axis, perm=perm) for a in w
            )
            w = word_cls.add_mod(w, recv, q_word)
            step <<= 1
        return w

    word_cls = wordmod.W32 if W == 1 else wordmod.W64
    q_word_ct = tuple(
        jnp.asarray(ct_ctx.q_arr)[l, :, 0][:, None] for l in range(W)
    )

    def _butterfly_poly(p: "PolyRq", axis) -> "PolyRq":
        """Exact cross-device modular sum of a PolyRq (any context)."""
        pctx = p.context
        qw = tuple(jnp.asarray(pctx.q_arr)[l, :, 0][:, None] for l in range(pctx.nlimbs))
        wcls = wordmod.W32 if pctx.nlimbs == 1 else wordmod.W64
        w = tuple(p.data[l] for l in range(pctx.nlimbs))
        w = _butterfly_word(w, qw, axis, wcls)
        return PolyRq(jnp.stack(w), pctx, p.fmt)

    def one(per_query, ek):
        cts = [
            bfv.Ciphertext(
                context,
                [
                    PolyRq(per_query[i][p], ct_ctx, COEFF)
                    for p in range(per_query[i].shape[0])
                ],
            )
            for i in range(n_ct)
        ]
        expanded = serving.expand_batched(
            cts, parameter.expanded_query_count, ek, context
        )
        dim0_cts = [bfv.ct_to_eval(c) for c in expanded[:d0]]
        query_eval = jnp.stack(
            [jnp.stack([c.polys[0].data, c.polys[1].data]) for c in dim0_cts]
        )  # [d0, 2, W, L, N]
        di = jax.lax.axis_index(daxis)
        local_q = jax.lax.dynamic_slice_in_dim(
            query_eval, di * d0_local, d0_local, axis=0
        )
        reply = []
        for chunk_index in range(n_chunks):
            chunk = chunks_arr_local[chunk_index]  # closed over, see below
            partial = serving.dim0_inner_products(chunk, local_q, ct_ctx)
            w = tuple(partial[:, :, l] for l in range(W))
            w = _butterfly_word(w, q_word_ct, daxis, word_cls)
            results = jnp.stack(w, axis=2)  # [C, 2, W, L, N]
            C = results.shape[0]
            columns = [
                bfv.Ciphertext(
                    context,
                    [
                        polymod.inverse_ntt(PolyRq(results[c, p], ct_ctx, EVAL))
                        for p in range(2)
                    ],
                )
                for c in range(C)
            ]
            query_start = d0
            for dim_size in parameter.dimensions[1:]:
                k_local = dim_size // Sd
                v0_stack = jnp.stack(
                    [
                        jnp.stack([p.data for p in c.polys])
                        for c in expanded[query_start : query_start + dim_size]
                    ]
                )  # [dim_size, 2, W, L, N]
                v0_local_arr = jax.lax.dynamic_slice_in_dim(
                    v0_stack, di * k_local, k_local, axis=0
                )
                new_cols = []
                for start in range(0, len(columns), dim_size):
                    col_stack = jnp.stack(
                        [
                            jnp.stack([p.data for p in c.polys])
                            for c in columns[start : start + dim_size]
                        ]
                    )
                    col_local_arr = jax.lax.dynamic_slice_in_dim(
                        col_stack, di * k_local, k_local, axis=0
                    )
                    acc = None
                    for k in range(k_local):
                        a = bfv.Ciphertext(
                            context,
                            [
                                PolyRq(v0_local_arr[k, p], ct_ctx, COEFF)
                                for p in range(2)
                            ],
                        )
                        b = bfv.Ciphertext(
                            context,
                            [
                                PolyRq(col_local_arr[k, p], ct_ctx, COEFF)
                                for p in range(2)
                            ],
                        )
                        prod = bfv.multiply_without_scaling(a, b)
                        if acc is None:
                            acc = prod
                        else:
                            acc = bfv.Ciphertext(
                                acc.context,
                                [
                                    polymod.add(x, y)
                                    for x, y in zip(acc.polys, prod.polys)
                                ],
                                acc.correction_factor,
                            )
                        # combine the extended-base accumulators across the
                        # db axis BEFORE the single scaling/floor
                    acc = bfv.Ciphertext(
                        acc.context,
                        [_butterfly_poly(p, daxis) for p in acc.polys],
                        acc.correction_factor,
                    )
                    prod = bfv.drop_extended_base(acc)
                    new_cols.append(bfv.relinearize(prod, ek))
                columns = new_cols
                query_start += dim_size
            single = bfv.mod_switch_down_to_single(columns[0])
            out = bfv.ct_to_coeff(single)
            reply.append(jnp.stack([p.data for p in out.polys]))
        return reply

    chunks_arr_local = None  # bound inside local()

    def local(stacked_local, chunks_local, ek):
        nonlocal chunks_arr_local
        chunks_arr_local = chunks_local  # [n_chunks, C, d0/Sd, W, L, N]
        out = jax.vmap(one, in_axes=(0, None))(stacked_local, ek)
        return out

    in_specs = (
        [P(baxis)] * n_ct,
        P(None, None, daxis),  # chunks partitioned on d0
        None,
    )
    cache = server.__dict__.setdefault("_two_axis_jits", {})
    key = (
        tuple(mesh.axis_names),
        tuple(mesh.devices.flatten().tolist()),
        mesh.devices.shape,
        B,
    )
    if key not in cache:
        cache[key] = jax.jit(
            jax.shard_map(
                lambda s, c, ek: local(s, c, ek),
                mesh=mesh,
                in_specs=in_specs,
                out_specs=P(baxis),
                check_vma=False,
            )
        )
    out = cache[key](stacked, chunks_arr, evaluation_key)
    # same structure as _respond_arrays: [query_index][chunk] -> [B, ...]
    return [list(out)]


def batch_parallel_pnns_response(server, queries, evaluation_key, mesh: Mesh):
    """PNNS analogue of batch_parallel_response: shard the query batch of a
    pnns_serving.BatchedPnnsServer across the mesh; XLA SPMD partitions the
    whole BSGS matmul pipeline with no manual collectives."""
    axis = mesh.axis_names[0]
    B = len(queries)
    _check_batch_divisible(B, mesh)
    stacked = server.stack_queries(queries)
    sharding = NamedSharding(mesh, P(axis))
    stacked = [jax.device_put(s, sharding) for s in stacked]
    return server.compute_response_batch_from_stacked(stacked, evaluation_key, B)

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

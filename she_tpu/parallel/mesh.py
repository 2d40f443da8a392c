"""Multi-chip sharded PIR serving over a jax device mesh.

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
  reduce with a `psum` over the 'db' axis. Modular exactness: each partial
  is fully reduced to [0, q) before the psum, and S*q < 2^32 guards the
  uint32 sum (S = devices on the axis), after which one vectorized fold
  brings the result back to [0, q).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pir import serving


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def batch_parallel_response(server: "serving.BatchedMulPirServer", queries, evaluation_key, mesh: Mesh):
    """Shard the query batch across the mesh; XLA partitions the pipeline.

    len(queries) must be divisible by the mesh axis size.
    """
    axis = mesh.axis_names[0]
    B = len(queries)
    assert B % mesh.devices.size == 0, "batch must divide the mesh"
    n_ct = len(queries[0].ciphertexts)
    server._indices_count = queries[0].indices_count
    stacked = [
        jnp.stack(
            [jnp.stack([p.data for p in q.ciphertexts[i].polys]) for q in queries]
        )
        for i in range(n_ct)
    ]
    sharding = NamedSharding(mesh, P(axis))
    stacked = [jax.device_put(s, sharding) for s in stacked]
    # delegate to the cached jitted program; XLA propagates the sharding
    return server.compute_response_batch_from_stacked(stacked, evaluation_key, B, n_ct)


def dim0_partial_psum(db_chunk, query_eval, ct_ctx, mesh: Mesh, axis: str = "db"):
    """Database-partitioned dim-0 inner products with a psum reduction.

    db_chunk [C, d0, W, L, N] is partitioned on d0 across `axis`; returns
    the same [C, 2, W, L, N] result as serving.dim0_inner_products.
    """
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[axis]
    d0 = db_chunk.shape[1]
    assert d0 % S == 0, "d0 must divide the mesh axis"
    q_arr = jnp.asarray(ct_ctx.q_arr)[0, :, 0][:, None]  # [L, 1]

    def local(db_local, q_local):
        partial = serving.dim0_inner_products(db_local, q_local, ct_ctx)
        # partial in [0, q); sum of S residues stays < S*q < 2^32
        summed = jax.lax.psum(partial, axis)
        # fold back to [0, q): up to S multiples of q
        r = summed
        for _ in range(max(1, S - 1)):
            r = jnp.minimum(r, r - q_arr)
        return r

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(None),
        check_rep=False,
    )(db_chunk, query_eval)


def batch_parallel_pnns_response(server, queries, evaluation_key, mesh: Mesh):
    """PNNS analogue of batch_parallel_response: shard the query batch of a
    pnns_serving.BatchedPnnsServer across the mesh; XLA SPMD partitions the
    whole BSGS matmul pipeline with no manual collectives."""
    axis = mesh.axis_names[0]
    B = len(queries)
    assert B % mesh.devices.size == 0, "batch must divide the mesh"
    n_matrices = len(queries[0].ciphertext_matrices)
    stacked = [
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
    sharding = NamedSharding(mesh, P(axis))
    stacked = [jax.device_put(s, sharding) for s in stacked]
    return server.compute_response_batch_from_stacked(stacked, evaluation_key, B)

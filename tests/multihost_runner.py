"""Two-process DCN-analogue worker: `jax.distributed` over CPU (gloo
collectives), batch-parallel MulPIR serving sharded across processes plus a
cross-process database-partitioned psum butterfly.

The reference is single-process (SURVEY §2.8); this is the TPU-native
multi-host layer BASELINE.json asks for, validated without multi-host
hardware by running two jax processes over loopback (the collectives cross
a real process boundary, the DCN analogue). Invoked by test_multihost.py:

    python tests/multihost_runner.py <process_id> <num_processes> <port>
"""

import sys


def main(pid: int, nprocs: int, port: str) -> None:
    import jax

    # the container's sitecustomize overrides jax_platforms to "axon,cpu";
    # force host CPU back before the backend initializes (as conftest does)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
        # compiles contend for the small CI host's cores, so processes can
        # skew past the default 300 s shutdown barrier deadline
        shutdown_timeout_seconds=1200,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from she_tpu import params as paramsmod
    from she_tpu.bfv import bfv
    from she_tpu.core.poly import COEFF, PolyRq
    from she_tpu.parallel import mesh as meshmod
    from she_tpu.pir import index_pir as ip, serving
    from she_tpu.rng.ctr_drbg import nist_aes128_ctr

    det = lambda t: nist_aes128_ctr((t * 32)[:32])
    ep = paramsmod.from_predefined("insecure_n_8_logq_5x18_logt_5", 32)
    ctx = bfv.get_bfv_context(ep)
    sk = bfv.generate_secret_key(ctx, det(b"s"))  # deterministic across procs
    config = ip.IndexPirConfig(
        entry_count=16,
        entry_size_in_bytes=1,
        dimension_count=2,
        batch_size=1,
        uneven_dimensions=False,
        key_compression=ip.PirKeyCompression.NO_COMPRESSION,
    )
    parameter = ip.generate_parameter(config, ctx)
    database = [bytes([i]) for i in range(16)]
    processed = ip.MulPirServer.process(database, ctx, parameter)
    client = ip.MulPirClient(parameter, ctx)
    ek = client.generate_evaluation_key(sk, det(b"k"))
    server = serving.BatchedMulPirServer(parameter, ctx, [processed])

    devices = jax.devices()
    assert len(devices) == nprocs * jax.local_device_count(), "global mesh"
    B = len(devices)
    indices = [i % 16 for i in range(B)]
    queries = [client.generate_query([i], sk) for i in indices]
    stacked, n_ct, indices_count = server.stack_queries(queries)

    # Ciphertext seeds are drawn fresh per process; adopt process 0's query
    # and key material everywhere (broadcast = first cross-process traffic).
    stacked = mhu.broadcast_one_to_all([np.asarray(s) for s in stacked])
    ek = mhu.broadcast_one_to_all(ek)

    # (1) query-batch data parallelism across processes: the stacked query
    # tensors shard over the global mesh; each process computes its shard.
    mesh = Mesh(np.array(devices), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    gstacked = [
        jax.make_array_from_callback(s.shape, sharding, lambda idx, s=s: s[idx])
        for s in stacked
    ]
    out = server._respond_arrays(gstacked, ek, B, n_ct, indices_count)
    out_np = [
        [np.asarray(mhu.process_allgather(a, tiled=True)) for a in reply]
        for reply in out
    ]
    responses = server._assemble_responses(out_np, B)
    for b in range(B):
        got = client.decrypt(responses[b], [indices[b]], sk)
        assert got[0][:1] == database[indices[b]], f"query {b} mismatch"

    # (2) database-partitioned dim-0 reduction: the ppermute butterfly of
    # modular adds crosses the process boundary (DCN-analogue collective).
    ct_ctx = ctx.ciphertext_context
    d0 = parameter.dimensions[0]
    q0 = ip.Query(
        [
            bfv.Ciphertext(
                ctx,
                [
                    PolyRq(jnp.asarray(stacked[i][0, p]), ct_ctx, COEFF)
                    for p in range(stacked[i].shape[1])
                ],
            )
            for i in range(n_ct)
        ],
        1,
    )
    expanded = ip.expand(q0.ciphertexts, parameter.expanded_query_count, ek)
    dim0 = [bfv.ct_to_eval(c) for c in expanded[:d0]]
    query_eval = jnp.stack(
        [jnp.stack([c.polys[0].data, c.polys[1].data]) for c in dim0]
    )
    n_chunks = ip.chunk_count(parameter, ctx)
    per_chunk = processed.count // n_chunks
    chunk = jnp.asarray(
        serving.pack_database_chunk(processed.plaintexts[:per_chunk], d0, ct_ctx)
    )
    local = jax.local_device_count()
    if d0 % 2 == 0 and nprocs >= 2:
        # One device from EACH process: the recursive-doubling ppermute
        # butterfly crosses the process boundary (the DCN-analogue this
        # test exists for). A mesh of devices[:2] would sit entirely on
        # process 0, leaving process 1 with no addressable output shards.
        db_mesh = Mesh(np.array([devices[0], devices[local]]), ("db",))
        chunk_np = np.asarray(chunk)
        qe_np = np.asarray(query_eval)
        chunk_g = jax.make_array_from_callback(
            chunk_np.shape,
            NamedSharding(db_mesh, P(None, "db")),
            lambda idx: chunk_np[idx],
        )
        qe_g = jax.make_array_from_callback(
            qe_np.shape,
            NamedSharding(db_mesh, P("db")),
            lambda idx: qe_np[idx],
        )
        got = meshmod.dim0_partial_psum(chunk_g, qe_g, ct_ctx, db_mesh)
        want = serving.dim0_inner_products(chunk, query_eval, ct_ctx)
        # out_specs is P(None): the result is replicated over db_mesh, so
        # every process holds an addressable copy
        got = np.asarray(got.addressable_data(0))
        assert (got == np.asarray(want)).all(), "cross-process psum mismatch"

    if pid == 0:
        print("MULTIHOST OK", flush=True)
    # On a small shared host the processes can skew by minutes (compiles
    # contend for cores); sync before shutdown so the coordination-service
    # shutdown barrier (5 min deadline) sees both tasks arrive together.
    mhu.sync_global_devices("she_tpu_multihost_done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])

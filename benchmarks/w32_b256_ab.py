"""w32 headline config at B=256: fused program vs staged pipeline (with the
donated expansion pool) — targets the round-4 B=256 HBM-crowding regression."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from she_tpu import params as paramsmod
from she_tpu.bfv import bfv
from she_tpu.pir import index_pir as ip, serving
from she_tpu.rng.ctr_drbg import nist_aes128_ctr

det = lambda t: nist_aes128_ctr((t * 32)[:32])
entries = 1_000_000
ep = paramsmod.from_predefined("n_4096_logq_27_28_28_logt_5", scalar_bits=32)
ctx = bfv.get_bfv_context(ep)
sk = bfv.generate_secret_key(ctx, det(b"s"))
config = ip.IndexPirConfig(
    entry_count=entries, entry_size_in_bytes=1, dimension_count=2,
    batch_size=1, uneven_dimensions=True,
    key_compression=ip.PirKeyCompression.NO_COMPRESSION)
parameter = ip.generate_parameter(config, ctx)
rng = np.random.default_rng(0)
values = rng.integers(0, 256, size=entries, dtype=np.uint8)
database = [bytes([v]) for v in values]
processed = ip.MulPirServer.process(database, ctx, parameter)
client = ip.MulPirClient(parameter, ctx)
ek = client.generate_evaluation_key(sk, det(b"k"))


def fence(x):
    return np.asarray(x[..., :2])


for B in (128, 256):
    for mode in ("fused", "staged"):
        os.environ["SHE_TPU_STAGED_SERVING"] = "1" if mode == "staged" else "0"
        server = serving.BatchedMulPirServer(parameter, ctx, [processed])
        indices = [int(rng.integers(0, entries)) for _ in range(B)]
        queries = [client.generate_query([i], sk) for i in indices]
        t0 = time.perf_counter()
        responses = server.compute_response_batch(queries, ek)
        fence(responses[0].ciphertexts[0][0].polys[0].data)
        compile_s = time.perf_counter() - t0
        got = client.decrypt(responses[0], [indices[0]], sk)
        assert got[0][:1] == database[indices[0]], "mismatch"
        stacked, n_ct, ic = server.stack_queries(queries)
        best = 0.0
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(2):
                out = server._respond_arrays(stacked, ek, B, n_ct, ic)
            fence(out[0][0])
            best = max(best, B * 2 / (time.perf_counter() - t0))
        print(f"B={B} {mode}: {best:.1f} q/s (compile+first {compile_s:.0f}s)",
              flush=True)

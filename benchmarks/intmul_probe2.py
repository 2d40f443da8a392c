"""Second probe: chain K dependent ops per scan step so per-step overhead
amortizes and the VPU compute cost becomes visible."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from she_tpu.ops import limb

N = 8192
L = 3
B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = 20
K = 16  # chained ops per step
shape = (B, L, N)
rng = np.random.default_rng(0)
a0 = jnp.asarray(rng.integers(0, 1 << 32, size=shape, dtype=np.uint32))
b0 = jnp.asarray(rng.integers(0, 1 << 32, size=shape, dtype=np.uint32))


def fence(x):
    return np.asarray(x[..., :2])


def timed(name, body):
    @jax.jit
    def run(a, b):
        def step(c, _):
            x, y = c
            for _ in range(K):
                o = body(x, y)
                x = o[0] if isinstance(o, tuple) else o
            return (x, y), ()

        c, _ = jax.lax.scan(step, (a, b), None, length=ITERS)
        return c[0]

    r = run(a0, b0)
    fence(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(a0, b0)
        fence(r)
        best = min(best, time.perf_counter() - t0)
    per_op_ns = best / ITERS / K / (B * L * N) * 1e9
    print(f"{name:28s}: {best*1e3/(ITERS*K):7.4f} ms/op  {per_op_ns:6.4f} ns/elem/op", flush=True)


timed("u32 add", lambda x, y: x + y)
timed("u32 mul (low)", lambda x, y: x * y)
timed("mul32 full (lo,hi)", lambda x, y: limb.mul32(x, y))
timed("mul64 (u128 out)", lambda x, y: limb.mul64((x, y), (y, x)))

from she_tpu.ops import word as wordmod

q = (1 << 55) - 311295
w = 123456789012345 % q
ws = wordmod.shoup_const(w, q, 64)
w_w = tuple(jnp.uint32(v) for v in (w & 0xFFFFFFFF, w >> 32))
ws_w = tuple(jnp.uint32(v) for v in (ws & 0xFFFFFFFF, ws >> 32))
q_w = tuple(jnp.uint32(v) for v in (q & 0xFFFFFFFF, q >> 32))
timed(
    "W64.mul_shoup",
    lambda x, y: wordmod.W64.mul_shoup(
        (x & np.uint32(0xFFFF), y & np.uint32(0x7FFFFF)), w_w, ws_w, q_w
    ),
)
timed(
    "W32.mul_shoup",
    lambda x, y: (
        wordmod.W32.mul_shoup(
            (x & np.uint32((1 << 27) - 1),),
            (jnp.uint32(12345),),
            (jnp.uint32(98765),),
            (jnp.uint32((1 << 27) + 9),),
        )[0],
        y,
    ),
)

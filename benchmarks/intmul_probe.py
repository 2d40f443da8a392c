"""Probe the VPU cost of u32 integer multiply variants on the real chip.

Determines whether XLA:TPU lowers 32-bit integer multiply natively (one op)
or via 16-bit chunking, and the relative cost of mul32/mul_shoup/u128 MACs —
the primitives every w64 kernel is built from.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from she_tpu.ops import limb

N = 8192
L = 3
B = 64
ITERS = 50
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
            o = body(x, y)
            # keep a dependency chain without growing values unboundedly
            x2 = o[0] if isinstance(o, tuple) else o
            return (x2, y), ()

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
    per_elem_ns = best / ITERS / (B * L * N) * 1e9
    print(f"{name:28s}: {best*1e3/ITERS:7.3f} ms/iter  {per_elem_ns:6.3f} ns/elem", flush=True)


timed("u32 add", lambda x, y: x + y)
timed("u32 mul (low)", lambda x, y: x * y)
timed("u16xu16 (masked) mul", lambda x, y: (x & 0xFFFF) * (y & 0xFFFF))
timed("mul32 full (lo,hi)", lambda x, y: limb.mul32(x, y))
timed("mulhi32", lambda x, y: (limb.mulhi32(x, y),))
timed("mul64 (u128 out)", lambda x, y: limb.mul64((x, y), (y, x)))
timed("mullo64", lambda x, y: limb.mullo64((x, y), (y, x)))
timed("add128", lambda x, y: limb.add128((x, y, x, y), (y, x, y, x)))

# w64 Shoup multiply cost (the NTT butterfly multiply)
from she_tpu.ops import word as wordmod

q = (1 << 55) - 311295
w = 123456789012345 % q
ws = wordmod.shoup_const(w, q, 64)
q_w = limb.to_u64_pair(q)
w_w = limb.to_u64_pair(w)
ws_w = limb.to_u64_pair(ws)
timed(
    "W64.mul_shoup",
    lambda x, y: wordmod.W64.mul_shoup(
        (x % np.uint32(0xFFFF), y % np.uint32(0x7FFFFF)), w_w, ws_w, q_w
    ),
)
timed(
    "W32.mul_shoup",
    lambda x, y: (
        wordmod.W32.mul_shoup(
            (x % np.uint32((1 << 27) - 1),),
            (jnp.uint32(12345),),
            (jnp.uint32(98765),),
            (jnp.uint32((1 << 27) + 9),),
        )[0],
    ),
)

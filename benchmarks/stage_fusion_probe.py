"""Is a radix-4 stage pair ONE memory pass or two? Chain K stage ops and
compare per-op cost of fwd_stage vs fwd_stage_pair at w64 NTT shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from she_tpu.ops import ntt as nttmod, word as wordmod

moduli = ((1 << 55) - 311295, (1 << 55) - 1392639, (1 << 55) - 1507327)
n, nlimbs, B, K = 8192, 2, 64, 8
tables = nttmod.build_ntt_tables(moduli, n, nlimbs)
rng = np.random.default_rng(0)
rows = np.zeros((B, 3, n), dtype=object)
for i, q in enumerate(moduli):
    rows[:, i, :] = rng.integers(0, q, size=(B, n)).astype(object)
x0 = jnp.asarray(wordmod.pack(rows, nlimbs))

W = wordmod.W64
q = wordmod.as_word(jnp.asarray(tables.q))
q2 = wordmod.as_word(jnp.asarray(tables.q2))
roots = wordmod.as_word(jnp.asarray(tables.roots))
roots_sh = wordmod.as_word(jnp.asarray(tables.roots_shoup))
qb = tuple(a[:, :, None] for a in q)
q2b = tuple(a[:, :, None] for a in q2)
m = 8
t = n >> 5  # pair quarter (stage log2m=3 half-span = 2t)
w1 = tuple(a[:, m:2*m, None] for a in roots)
w1s = tuple(a[:, m:2*m, None] for a in roots_sh)
w2 = tuple(a[:, 2*m:4*m:2, None] for a in roots)
w2s = tuple(a[:, 2*m:4*m:2, None] for a in roots_sh)
w3 = tuple(a[:, 2*m+1:4*m:2, None] for a in roots)
w3s = tuple(a[:, 2*m+1:4*m:2, None] for a in roots_sh)


def fence(x):
    return np.asarray(x[..., :2])


def timed(name, body, per_call_stages):
    @jax.jit
    def run(x):
        def step(c, _):
            w = tuple(c[i] for i in range(nlimbs))
            y = body(w)
            return jnp.stack(y), ()
        y, _ = jax.lax.scan(step, x, None, length=K)
        return y
    y = run(x0); fence(y)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fence(run(x0))
        best = min(best, time.perf_counter() - t0)
    per_stage_ms = best / K / per_call_stages * 1e3
    print(f"{name}: {best/K*1e3:.3f} ms/call -> {per_stage_ms:.3f} ms/stage-equiv", flush=True)


timed("fwd_stage (radix2)", lambda w: nttmod.fwd_stage(W, w, w1, w1s, qb, q2b, m, 2*t), 1)
timed("fwd_stage_pair (radix4)", lambda w: nttmod.fwd_stage_pair(W, w, w1, w1s, w2, w2s, w3, w3s, qb, q2b, m, t), 2)
timed("mul_shoup_lazy only", lambda w: W.mul_shoup_lazy(w, tuple(a[:, :1] for a in roots), tuple(a[:, :1] for a in roots_sh), q), 1)
timed("plain add64", lambda w: nttmod._wrap_add(W, w, w), 1)

"""Sharded-polynomial (N axis) and sharded-limb (L axis) ops over a mesh.

The reference walks every polynomial per-modulus inside one process
(PolyRq+Ntt.swift:209-233,519-534); the TPU-native scaling design (SURVEY
§5/§7.1) shards the polynomial itself:

* **Sharded-N NTT**: a `[L, N]` RNS poly is split into S contiguous
  N-blocks across a mesh axis. Butterfly stage `log2m` pairs elements at
  distance `t = N >> (log2m+1)`; while `t >= N/S` (the first `log2 S`
  stages) the partner lives on device `d XOR (S >> (log2m+1))` at the same
  local offset, so each stage is ONE full-shard `ppermute` exchange over
  ICI followed by a local half-butterfly. Once `t < N/S`, every remaining
  stage is device-local and reuses the exact stage kernels of `ops/ntt.py`
  — the arithmetic sequence per element is identical to the single-device
  path, so results are bit-equal, not just numerically close.
* **Sharded-limb NTT**: RNS rows are independent, so sharding `[L, N]` on
  L needs zero collectives — the twiddle tables ride the same shard_map
  specs as the data (L-parallel ops axis from SURVEY §7.1).
* **Sharded ct·ct multiply**: the whole BEHZ pipeline
  (Bfv+Multiply.swift:18-85) other than the NTT is coefficient-wise along
  N, so with the NTT exchanges above, the full multiply runs with the
  polynomials sharded end-to-end: lift -> sharded fwd NTT -> tensor
  product -> sharded inv NTT -> floor, all inside one shard_map program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import errors
from ..core import poly as polymod
from ..core.poly import COEFF, EVAL, PolyRq
from ..ops import ntt as nttmod
from ..ops import word as wordmod
from ..utils import nt


def _dyn_root(arrs, start, size: int):
    """word of [L, N] root tables -> word of [L, size] at traced offset."""
    return tuple(
        jax.lax.dynamic_slice_in_dim(a, start, size, axis=1) for a in arrs
    )


def _sel(pred, a, b):
    return tuple(jnp.where(pred, x, y) for x, y in zip(a, b))


class ShardedNtt:
    """Forward/inverse negacyclic NTT on polynomials sharded on N.

    `forward_local` / `inverse_local` run INSIDE `jax.shard_map` on the
    local shard (word of [L, N/S] arrays); `forward` / `inverse` are
    convenience wrappers for full stacked [W, L, N] arrays.
    """

    def __init__(self, mesh: Mesh, tables: nttmod.NttTables, axis: str):
        self.mesh = mesh
        self.axis = axis
        self.tables = tables
        self.S = mesh.shape[axis]
        n = tables.degree
        if n % self.S != 0 or (self.S > 1 and not nt.is_power_of_two(self.S)):
            raise errors.InvalidArgument(
                f"mesh axis size {self.S} must be a power of two dividing N={n}"
            )
        self.log2S = nt.log2_exact(self.S) if self.S > 1 else 0
        self.log2n = nt.log2_exact(n)
        if self.log2S >= self.log2n:
            raise errors.InvalidArgument(f"mesh axis {self.S} >= degree {n}")

    def _consts(self):
        t = self.tables
        return dict(
            q=wordmod.as_word(jnp.asarray(t.q)),
            q2=wordmod.as_word(jnp.asarray(t.q2)),
            roots=wordmod.as_word(jnp.asarray(t.roots)),
            roots_sh=wordmod.as_word(jnp.asarray(t.roots_shoup)),
            iroots=wordmod.as_word(jnp.asarray(t.inv_roots)),
            iroots_sh=wordmod.as_word(jnp.asarray(t.inv_roots_shoup)),
            ninv=wordmod.as_word(jnp.asarray(t.n_inv)),
            ninv_sh=wordmod.as_word(jnp.asarray(t.n_inv_shoup)),
            ninvw=wordmod.as_word(jnp.asarray(t.n_inv_w)),
            ninvw_sh=wordmod.as_word(jnp.asarray(t.n_inv_w_shoup)),
        )

    # -- cross-device butterfly helpers ------------------------------------

    def _exchange(self, x, dist: int):
        """Full-shard exchange with device d XOR dist over ICI."""
        perm = [(s, s ^ dist) for s in range(self.S)]
        return tuple(
            jax.lax.ppermute(a, axis_name=self.axis, perm=perm) for a in x
        )

    def forward_local(self, x):
        """x: word of [L, n_local] in [0, q) -> eval shard in [0, q)."""
        if self.S == 1:
            return nttmod.forward_ntt(x, self.tables)
        W = self.tables.word
        n = self.tables.degree
        c = self._consts()
        q, q2 = c["q"], c["q2"]
        d = jax.lax.axis_index(self.axis)
        # stages with t >= n_local: partner shard on another device
        for log2m in range(self.log2S):
            m = 1 << log2m
            dist = self.S >> (log2m + 1)
            partner = self._exchange(x, dist)
            lower = (d & dist) == 0  # this device holds the x half
            block = d // (2 * dist)
            w = _dyn_root(c["roots"], m + block, 1)  # [L, 1]
            ws = _dyn_root(c["roots_sh"], m + block, 1)
            xx = _sel(lower, x, partner)
            yy = _sel(lower, partner, x)
            xx = nttmod._lazy_sub_2q(W, xx, q2)  # [0, 2q)
            tt = W.mul_shoup_lazy(yy, w, ws, q)  # [0, 2q)
            new_x = nttmod._wrap_add(W, xx, tt)  # [0, 4q)
            new_y = nttmod._wrap_add(W, nttmod._wrap_sub(W, xx, tt), q2)
            x = _sel(lower, new_x, new_y)
        # device-local stages: identical kernels to the single-device path
        qb = tuple(a[:, :, None] for a in q)
        q2b = tuple(a[:, :, None] for a in q2)
        for log2m in range(self.log2S, self.log2n):
            m = 1 << log2m
            t = n >> (log2m + 1)
            m_local = m // self.S
            w = tuple(a[:, :, None] for a in _dyn_root(c["roots"], m + d * m_local, m_local))
            ws = tuple(a[:, :, None] for a in _dyn_root(c["roots_sh"], m + d * m_local, m_local))
            x = nttmod.fwd_stage(W, x, w, ws, qb, q2b, m_local, t)
        return W.reduce_4q(x, q)

    def inverse_local(self, x):
        """x: word of [L, n_local] eval shard in [0, q) -> coeff in [0, q)."""
        if self.S == 1:
            return nttmod.inverse_ntt(x, self.tables)
        W = self.tables.word
        n = self.tables.degree
        c = self._consts()
        q, q2 = c["q"], c["q2"]
        d = jax.lax.axis_index(self.axis)
        qb = tuple(a[:, :, None] for a in q)
        q2b = tuple(a[:, :, None] for a in q2)
        # device-local stages first (reverse order of forward)
        for log2m in reversed(range(self.log2S, self.log2n)):
            m = 1 << log2m
            t = n >> (log2m + 1)
            m_local = m // self.S
            w = tuple(a[:, :, None] for a in _dyn_root(c["iroots"], m + d * m_local, m_local))
            ws = tuple(a[:, :, None] for a in _dyn_root(c["iroots_sh"], m + d * m_local, m_local))
            x = nttmod.inv_stage(W, x, w, ws, qb, q2b, m_local, t)
        # cross-device stages
        for log2m in reversed(range(self.log2S)):
            m = 1 << log2m
            dist = self.S >> (log2m + 1)
            partner = self._exchange(x, dist)
            lower = (d & dist) == 0
            xx = _sel(lower, x, partner)
            yy = _sel(lower, partner, x)
            s = nttmod._wrap_add(W, xx, yy)  # [0, 4q)
            diff = nttmod._wrap_add(W, nttmod._wrap_sub(W, xx, yy), q2)
            if m > 1:
                block = d // (2 * dist)
                w = _dyn_root(c["iroots"], m + block, 1)
                ws = _dyn_root(c["iroots_sh"], m + block, 1)
                new_x = nttmod._lazy_sub_2q(W, s, q2)  # [0, 2q)
                new_y = W.mul_shoup_lazy(diff, w, ws, q)  # [0, 2q)
            else:
                # final stage: fold n^-1 / n^-1 * w^-1, fully reduce
                new_x = W.mul_shoup(s, c["ninv"], c["ninv_sh"], q)
                new_y = W.mul_shoup(diff, c["ninvw"], c["ninvw_sh"], q)
            x = _sel(lower, new_x, new_y)
        return x

    # -- full-array wrappers -------------------------------------------------

    def _wrap(self, local_fn):
        spec = P(None, None, self.axis)
        f = jax.shard_map(
            lambda data: jnp.stack(local_fn(wordmod.as_word(data))),
            mesh=self.mesh,
            in_specs=spec,
            out_specs=spec,
            check_vma=False,
        )
        return jax.jit(f)

    @property
    def forward(self):
        """jitted [W, L, N] -> [W, L, N], input sharded on N."""
        if not hasattr(self, "_fwd"):
            self._fwd = self._wrap(self.forward_local)
        return self._fwd

    @property
    def inverse(self):
        if not hasattr(self, "_inv"):
            self._inv = self._wrap(self.inverse_local)
        return self._inv


def limb_parallel_ntt_fns(mesh: Mesh, tables: nttmod.NttTables, axis: str = "limb"):
    """RNS-limb mesh axis: rows of a [L, N] poly transform independently, so
    sharding L across the mesh needs no collectives at all — the twiddle
    tables shard with the data. Returns (fwd, inv) jitted on [W, L, N].
    Requires mesh.shape[axis] to divide L."""
    S = mesh.shape[axis]
    L = len(tables.moduli)
    if L % S != 0:
        raise errors.InvalidArgument(f"mesh axis size {S} must divide L={L}")
    W = tables.word
    n = tables.degree
    spec = P(None, axis, None)
    scalar_spec = P(None, axis, None)

    t = tables
    consts = [jnp.asarray(a) for a in (t.q, t.q2, t.roots, t.roots_shoup)]
    iconsts = [
        jnp.asarray(a)
        for a in (
            t.q,
            t.q2,
            t.inv_roots,
            t.inv_roots_shoup,
            t.n_inv,
            t.n_inv_shoup,
            t.n_inv_w,
            t.n_inv_w_shoup,
        )
    ]

    def fwd_local(data, q, q2, roots, roots_sh):
        out = nttmod.forward_ntt_arrays(
            wordmod.as_word(data),
            n,
            W,
            wordmod.as_word(q),
            wordmod.as_word(q2),
            wordmod.as_word(roots),
            wordmod.as_word(roots_sh),
        )
        return jnp.stack(out)

    def inv_local(data, q, q2, ir, irs, ninv, ninv_sh, ninvw, ninvw_sh):
        out = nttmod.inverse_ntt_arrays(
            wordmod.as_word(data),
            n,
            W,
            wordmod.as_word(q),
            wordmod.as_word(q2),
            wordmod.as_word(ir),
            wordmod.as_word(irs),
            wordmod.as_word(ninv),
            wordmod.as_word(ninv_sh),
            wordmod.as_word(ninvw),
            wordmod.as_word(ninvw_sh),
        )
        return jnp.stack(out)

    fwd_sm = jax.jit(
        jax.shard_map(
            fwd_local,
            mesh=mesh,
            in_specs=(spec, scalar_spec, scalar_spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    )
    inv_sm = jax.jit(
        jax.shard_map(
            inv_local,
            mesh=mesh,
            in_specs=(spec,) + (scalar_spec,) * 2 + (spec,) * 2 + (scalar_spec,) * 4,
            out_specs=spec,
            check_vma=False,
        )
    )
    return (
        lambda data: fwd_sm(data, *consts),
        lambda data: inv_sm(data, *iconsts),
    )


# ---------------------------------------------------------------------------
# End-to-end sharded BEHZ ct*ct multiply
# ---------------------------------------------------------------------------


def sharded_ct_mul(a, b, mesh: Mesh, axis: str = "n"):
    """Full BEHZ ct*ct multiply (Bfv+Multiply.swift:18-85) with every
    polynomial sharded on N across `axis` for the whole pipeline; only the
    NTT stages communicate (log2(S) ppermute exchanges each). Bit-equal to
    bfv.ct_mul."""
    from ..bfv import bfv

    if a.context is not b.context:
        raise errors.IncompatibleContexts("different contexts")
    if len(a.polys) != 2 or len(b.polys) != 2:
        raise errors.InvalidCiphertext("multiply requires 2-poly ciphertexts")
    if a.correction_factor != 1 or b.correction_factor != 1:
        raise errors.InvalidCorrectionFactor("multiply requires correction factor 1")
    if a.fmt != COEFF or b.fmt != COEFF:
        raise errors.InvalidFormat("multiply requires canonical (Coeff) ciphertexts")
    ctx = a.context
    ct_ctx = a.polys[0].context
    tool = ctx.get_rns_tool(a.moduli_count)
    qbsk_ctx = tool.q_bsk_context
    sn = ShardedNtt(mesh, qbsk_ctx.ntt_tables, axis)
    t = ctx.plaintext_modulus
    count = len(qbsk_ctx.moduli)
    Wcls = qbsk_ctx.word

    def mul_rows(x, y):
        rows = []
        for i, rc in enumerate(qbsk_ctx.row_consts):
            rows.append(
                Wcls.mulmod(
                    polymod._row(x, i),
                    polymod._row(y, i),
                    qbsk_ctx.row_word("q", i),
                    rc["k"],
                    qbsk_ctx.row_word("mu", i),
                )
            )
        return polymod._stack_rows(rows)

    def behz_local(data):
        lifted = tool.lift_q_to_qbsk(wordmod.as_word(data))
        return sn.forward_local(lifted)

    def local(a0, a1, b0, b1):
        la = [behz_local(a0), behz_local(a1)]
        lb = [behz_local(b0), behz_local(b1)]
        qw = wordmod.as_word(jnp.asarray(qbsk_ctx.q_arr))
        p0 = mul_rows(la[0], lb[0])
        p1 = Wcls.add_mod(mul_rows(la[0], lb[1]), mul_rows(la[1], lb[0]), qw)
        p2 = mul_rows(la[1], lb[1])
        outs = []
        for pw in (p0, p1, p2):
            scaled = polymod.mul_scalar_rows(
                PolyRq.from_word(pw, qbsk_ctx, EVAL), [t] * count
            ).word()
            coeff = sn.inverse_local(scaled)
            outs.append(jnp.stack(tool.floor_qbsk_to_q(coeff)))
        return tuple(outs)

    spec = P(None, None, axis)
    run = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec,) * 4,
            out_specs=(spec,) * 3,
            check_vma=False,
        )
    )
    r0, r1, r2 = run(
        a.polys[0].data, a.polys[1].data, b.polys[0].data, b.polys[1].data
    )
    return bfv.Ciphertext(
        ctx,
        [PolyRq(r, ct_ctx, COEFF) for r in (r0, r1, r2)],
        a.correction_factor,
    )

"""Chained lane kernels — the second kernel split (humanoid scale).

The round-4 primal/tangent split (`ops/jvp_split.py`) put the bench
models' frozen-step linearize inside the Mosaic compile envelope, but an
Atlas-class humanoid (nq = 33, m = 102) still traces to lane programs
~5x over it (measured round 5: 199k emitted primal ops / 178k tangent vs
the ~40k the half-cheetah kernels compile at). This module generalizes
the split: ANY straight-line lane program is cut into a CHAIN of
kernels, each under an emitted-op budget, communicating through packed
per-lane boundary tensors in HBM:

  * cuts are chosen by walking the equation list with a per-equation
    EMITTED-op cost model (a jaxpr dot_general is one equation but
    `lane_eval` unrolls it ~6x its contraction size) and, within the
    feasible window of each cut, picking the position with the smallest
    live set — classic min-cut-on-a-line rematerialization-free
    pipelining;
  * chunk i's kernel unpacks boundary i-1 from HBM, evaluates its
    equations with `lane_eval`, and packs boundary i (the batched vars
    any later chunk — or the program outputs — consume);
  * for a TANGENT chain (the per-direction half of a split JVP/VJP),
    the K basis directions ride a second grid dimension and the
    intermediate boundaries are per-(point, direction) tensors — the
    cut-position live-set minimization is what keeps their HBM
    footprint bounded.

This mirrors, one level up, exactly what the primal/tangent split did:
the reference's BackpropSnapshot reuses one saved factorization across
directions (/root/reference/dart/neural/BackpropSnapshot.cpp:2723-2774);
here the chain reuses every primal chunk's work across the direction
grid, and the chain structure itself exists only because the compile
service bounds single-kernel size.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    from jax._src.core import Literal
except Exception:  # pragma: no cover
    from jax.core import Literal  # type: ignore

from nimblephysics_tpu.ops.jvp_split import SplitJVPFn, _JaxprView
from nimblephysics_tpu.ops.lanevmap import (
    _REDUCE_MAT_CAP,
    _REDUCE_MIN_C,
    lane_eval,
)
from nimblephysics_tpu.ops.pallas_linearize import _const_spec


def emit_cost(eqn) -> int:
    """Estimated ops `lane_eval` emits for one jaxpr equation (the unit
    the Mosaic compile envelope is bounded in)."""
    prim = eqn.primitive.name
    if prim == "dot_general":
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lsh = eqn.invars[0].aval.shape
        rsh = eqn.invars[1].aval.shape
        if not lc or lb:
            return 4
        csize = int(np.prod([lsh[d] for d in lc]))
        lfree = [d for d in range(len(lsh)) if d not in lc and d not in lb]
        rfree = [d for d in range(len(rsh)) if d not in rc and d not in rb]
        out_free = int(np.prod([lsh[d] for d in lfree], dtype=np.int64)
                       * np.prod([rsh[d] for d in rfree], dtype=np.int64))
        if len(lc) == 1 and csize >= _REDUCE_MIN_C:
            cchunk = min(csize, max(1, _REDUCE_MAT_CAP // max(out_free, 1)))
            if cchunk >= 8:
                return 5 * -(-csize // cchunk)
        return 6 * csize
    if prim == "transpose":
        sh = eqn.invars[0].aval.shape
        if len(sh) <= 2:
            return 1
        return max(1, int(np.prod(sh[:-2])))
    if prim == "custom_linear_solve":
        js = eqn.params["jaxprs"]
        return sum(emit_cost(e) for e in js.solve.jaxpr.eqns) + 4
    if prim == "concatenate":
        return len(eqn.invars)
    sub = None
    for p in eqn.params.values():
        sub = getattr(p, "jaxpr", None) or (p if hasattr(p, "eqns") else None)
        if sub is not None:
            break
    if sub is not None and hasattr(sub, "eqns"):
        return sum(emit_cost(e) for e in sub.eqns) + 1
    return 1


class LaneChain:
    """Cut a straight-line lane program (batched eqns only; unbatched
    values live in the parent's pre_env) into chunks under an emitted-op
    budget, with per-cut boundary var lists.

    in_vars/in_batched: the program invars (unbatched ones — e.g. basis
    directions — are fed to every chunk directly, not packed).
    out_vars: the values the final chunk must produce, in pack order.
    """

    def __init__(self, eqns: Sequence[Any], in_vars: Sequence[Any],
                 in_batched: Sequence[bool], out_vars: Sequence[Any],
                 budget: int, extern: Sequence[Any] = ()):
        """`extern`: batched in_vars delivered to every chunk externally
        (per-chunk packs) instead of flowing through the chain's
        boundaries — for a tangent chain, the primal boundary values.
        Without this the (m, m) primal matrices the tangent equations
        keep consuming would ride every per-direction boundary tensor,
        K-multiplying their HBM footprint."""
        self.eqns = list(eqns)
        self.in_vars = list(in_vars)
        self.in_batched = list(in_batched)
        self.out_vars = list(out_vars)
        self.extern = set(extern)

        batched = {v for v, b in zip(in_vars, in_batched) if b}
        for eqn in self.eqns:
            batched.update(eqn.outvars)
        self.batched = batched

        n = len(self.eqns)
        costs = [emit_cost(e) for e in self.eqns]
        # birth/last-use (positions are eqn indices; invars birth -1;
        # out_vars last-use +inf)
        birth: Dict[Any, int] = {v: -1 for v in batched}
        last: Dict[Any, int] = {}
        for i, eqn in enumerate(self.eqns):
            for ov in eqn.outvars:
                birth[ov] = i
            for v in eqn.invars:
                if not isinstance(v, Literal) and v in batched:
                    last[v] = i
        for v in self.out_vars:
            if v in batched:
                last[v] = n + 1

        def nel(v):
            return int(np.prod(v.aval.shape))

        # live_floats[p] = batched floats crossing a cut AFTER eqn p
        delta = np.zeros(n + 1, dtype=np.int64)
        for v in batched:
            b = birth.get(v, -1)
            e = last.get(v, -2)
            if e > b:
                delta[b + 1 if b >= 0 else 0] += nel(v)
                if e <= n:
                    delta[e] -= nel(v)
        live = np.cumsum(delta)[:n] if n else np.zeros(0, dtype=np.int64)

        # greedy cuts with windowed live-minimization
        cuts: List[int] = []
        acc = 0
        win_start = 0
        cum = np.cumsum(costs) if n else np.zeros(0)
        p = 0
        while p < n:
            acc += costs[p]
            if acc > budget and p > win_start:
                lo = win_start
                # window: positions within this chunk whose chunk-cost
                # exceeds half the budget (don't cut degenerately early)
                base = cum[win_start - 1] if win_start > 0 else 0
                half = [q for q in range(lo, p)
                        if cum[q] - base >= 0.5 * budget]
                cand = half if half else list(range(lo, p))
                cut = min(cand, key=lambda q: live[q])
                cuts.append(cut)
                win_start = cut + 1
                acc = cum[p] - cum[cut]
            p += 1
        self.cut_positions = cuts
        bnds = cuts + [n - 1] if n else []
        starts = [0] + [c + 1 for c in cuts]
        self.chunks = [self.eqns[s: e + 1] for s, e in zip(starts, bnds)]
        self.chunk_costs = [
            int(sum(costs[s: e + 1])) for s, e in zip(starts, bnds)
        ]

        # boundary var lists (ordered by birth) per cut
        order = {v: birth.get(v, -1) for v in batched}
        self.bounds: List[List[Any]] = []
        for cut in cuts:
            bv = [v for v in batched
                  if birth.get(v, -1) <= cut and last.get(v, -2) > cut
                  and nel(v) > 0 and v not in self.extern]
            bv.sort(key=lambda v: (order[v], str(v)))
            self.bounds.append(bv)
        self.bound_metas = [
            [(tuple(v.aval.shape), v.aval.dtype, nel(v)) for v in bv]
            for bv in self.bounds
        ]
        for metas in self.bound_metas:
            for _, dt, _ in metas:
                if not (jnp.issubdtype(dt, jnp.floating) or dt == jnp.bool_):
                    raise NotImplementedError(
                        f"chain boundary with non-float dtype {dt}")
        self.bound_rows = [sum(m[2] for m in metas)
                           for metas in self.bound_metas]

    @property
    def n_chunks(self) -> int:
        return len(self.chunks)

    def extern_needs(self, idx: int, extern_order: Sequence[Any]
                     ) -> List[Any]:
        """Extern vars chunk `idx` consumes, in `extern_order` order."""
        used = set()
        for eqn in self.chunks[idx]:
            for v in eqn.invars:
                if not isinstance(v, Literal) and v in self.extern:
                    used.add(v)
        return [v for v in extern_order if v in used]

    # -- kernel-side chunk evaluation -------------------------------------

    def eval_chunk(self, idx: int, env: Dict[Any, Any],
                   env_batched: Dict[Any, bool], bt,
                   lit_vals, pre_env) -> List[jax.Array]:
        """Evaluate chunk `idx` given an env holding its input vars;
        returns the values of this chunk's out list (boundary vars, or
        the program out_vars for the last chunk), packed order."""
        outs = self.bounds[idx] if idx < self.n_chunks - 1 else self.out_vars
        view = _JaxprView([], list(env.keys()), list(outs),
                          self.chunks[idx])
        vals = [env[v] for v in env]
        flags = [env_batched[v] for v in env]
        return lane_eval(view, [], vals, flags, bt,
                         literal_vals=lit_vals, pre_env=pre_env)


def pack_rows(vals, metas, bt) -> jax.Array:
    parts = []
    for val, (shp, dt, n) in zip(vals, metas):
        if dt == jnp.bool_:
            val = jnp.where(val, jnp.float32(1.0), jnp.float32(0.0))
        elif val.dtype != jnp.float32:
            val = val.astype(jnp.float32)
        parts.append(jax.lax.reshape(val, (n,) + bt))
    return jax.lax.concatenate(parts, 0)


def unpack_rows(packed, metas, bt) -> List[jax.Array]:
    vals, off = [], 0
    for shp, dt, n in metas:
        sl = jax.lax.slice_in_dim(packed, off, off + n, axis=0)
        val = jax.lax.reshape(sl, tuple(shp) + bt)
        if dt == jnp.bool_:
            val = val != 0
        elif dt != jnp.float32:
            val = val.astype(dt)
        vals.append(val)
        off += n
    return vals


# ---------------------------------------------------------------------------
# Chained row-VJP linearize (grid (G,) primal chain + grid (G, K) tangent
# chain) — the humanoid-scale variant of pallas_linearize.linearize_pallas_vjp
# ---------------------------------------------------------------------------

_CHAIN_CACHE: dict = {}


class _VJPChains(NamedTuple):
    sf: Any
    pchain: LaneChain
    tchain: LaneChain
    pneeds: Tuple[List[Any], ...]    # per-tangent-chunk primal var lists
    pneeds_meta: Tuple[List[Tuple], ...]
    pneeds_rows: Tuple[int, ...]


def _chains_for(model, m_cl, nx, na, dtype, cg_iters, budget):
    from nimblephysics_tpu.ops.pallas_linearize import _vjp_fn_for

    key = ("chain", id(model), m_cl, nx, na, jnp.dtype(dtype).name,
           cg_iters, budget)
    hit = _CHAIN_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    sf = _vjp_fn_for(model, m_cl, nx, na, dtype, cg_iters=cg_iters)
    targs = sf.tangent_view.invars[len(sf.bound_vars):]
    tchain = LaneChain(sf.tangent_view.eqns, sf.tangent_view.invars,
                       [True] * len(sf.bound_vars) + [False] * len(targs),
                       sf.tangent_view.outvars, budget,
                       extern=sf.bound_vars)
    pneeds = tuple(tchain.extern_needs(j, sf.bound_vars)
                   for j in range(tchain.n_chunks))
    union: List[Any] = []
    seen = set()
    for grp in pneeds:
        for v in grp:
            if v not in seen:
                seen.add(v)
                union.append(v)
    pchain = LaneChain(sf.primal_view.eqns, sf.primal_view.invars,
                       [True] * len(sf.primal_view.invars),
                       union, budget)

    def nel(v):
        return int(np.prod(v.aval.shape))

    pneeds_meta = tuple(
        [(tuple(v.aval.shape), v.aval.dtype, nel(v)) for v in grp]
        for grp in pneeds)
    pneeds_rows = tuple(sum(m[2] for m in metas) for metas in pneeds_meta)
    out = _VJPChains(sf, pchain, tchain, pneeds, pneeds_meta, pneeds_rows)
    _CHAIN_CACHE[key] = (model, out)
    return out


def chained_linearize_vjp(
    model,
    xs: jax.Array,      # (B, T, nx)
    u: jax.Array,       # (B, T, na)
    classes,            # (cmask, us) each (B, T, m)
    block_b: int = 128,
    interpret: bool = None,
    cg_iters: int = None,
    budget: int = 36_000,
) -> Tuple[jax.Array, jax.Array]:
    """(fx, fu) via the CHAINED row-VJP kernels — for models whose split
    halves exceed the Mosaic envelope (Atlas-class). Same math as
    `linearize_pallas_vjp`; each half runs as a chain of kernels."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, nx = xs.shape
    na = u.shape[-1]
    nq = nx // 2
    dtype = xs.dtype
    m_cl = classes[0].shape[-1]
    ch = _chains_for(model, m_cl, nx, na, dtype, cg_iters, budget)
    sf, pchain, tchain = ch.sf, ch.pchain, ch.tchain

    block_b = max(128, (block_b // 128) * 128)
    S_b = block_b // 128
    N = B * T
    N_pad = -(-N // block_b) * block_b
    G = N_pad // block_b
    bt = (S_b, 128)
    no = nx + na

    def lanes(a2):
        aT = a2.T
        if N_pad != N:
            aT = jnp.pad(aT, ((0, 0), (0, N_pad - N)))
        return aT.reshape(aT.shape[0], G, S_b, 128)

    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, 1, S_b, 128), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )

    args_in = [lanes(xs.reshape(N, nx)), lanes(u.reshape(N, na)),
               lanes(classes[0].reshape(N, m_cl)),
               lanes(classes[1].reshape(N, m_cl))]
    arg_specs = [lane_spec(nx), lane_spec(na), lane_spec(m_cl),
                 lane_spec(m_cl)]
    p_invars = sf.primal_view.invars

    # ---- primal chain: grid (G,); the last chunk writes one pack PER
    # TANGENT CHUNK (only the primal vars that chunk consumes — keeps the
    # big (m, m) primal matrices out of the per-direction HBM traffic and
    # out of every tangent kernel's VMEM) ----
    cur = None  # packed boundary from the previous chunk
    for ci in range(pchain.n_chunks):
        last = ci == pchain.n_chunks - 1
        in_metas = (None if ci == 0 else pchain.bound_metas[ci - 1])
        in_vars = (p_invars if ci == 0 else pchain.bounds[ci - 1])

        def kernel(*refs, _ci=ci, _in_metas=in_metas, _in_vars=in_vars,
                   _last=last):
            const_refs = refs[:sf.n_consts]
            lit_vals, pre = sf._cvals([cr[...] for cr in const_refs])
            if _ci == 0:
                arg_refs = refs[sf.n_consts: sf.n_consts + 4]
                vals = [jax.lax.squeeze(r[...], (1,)) for r in arg_refs]
            else:
                b_r = refs[sf.n_consts]
                packed = jax.lax.squeeze(b_r[...], (1,))
                vals = unpack_rows(packed, _in_metas, bt)
            env = dict(zip(_in_vars, vals))
            envb = {v: True for v in _in_vars}
            outs = pchain.eval_chunk(_ci, env, envb, bt, lit_vals, pre)
            if _last:
                union_vals = dict(zip(pchain.out_vars, outs))
                out_refs = refs[-tchain.n_chunks:]
                for j, oref in enumerate(out_refs):
                    grp = [union_vals[v] for v in ch.pneeds[j]]
                    oref[...] = jax.lax.expand_dims(
                        pack_rows(grp, ch.pneeds_meta[j], bt), (1,))
            else:
                refs[-1][...] = jax.lax.expand_dims(
                    pack_rows(outs, pchain.bound_metas[_ci], bt), (1,))

        in_specs = [_const_spec(c) for c in sf.consts2d]
        ins = list(sf.consts2d)
        if ci == 0:
            in_specs += arg_specs
            ins += args_in
        else:
            in_specs += [lane_spec(pchain.bound_rows[ci - 1])]
            ins += [cur]
        if last:
            out_specs = [lane_spec(r) for r in ch.pneeds_rows]
            out_shape = [jax.ShapeDtypeStruct((r, G, S_b, 128), jnp.float32)
                         for r in ch.pneeds_rows]
        else:
            out_rows = pchain.bound_rows[ci]
            out_specs = lane_spec(out_rows)
            out_shape = jax.ShapeDtypeStruct((out_rows, G, S_b, 128),
                                             jnp.float32)
        cur = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*ins)
    primal_packs = list(cur)  # one per tangent chunk

    # ---- tangent chain: grid (G, K) ----
    bas = jnp.zeros((nq, 8, 128), dtype)
    bas = bas.at[:, 0, :nq].set(jnp.eye(nq, dtype=dtype))
    bas_spec = pl.BlockSpec(
        (1, 8, 128), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM,
    )
    t_invars = sf.tangent_view.invars
    targs = t_invars[len(sf.bound_vars):]
    cur_t = None
    for ci in range(tchain.n_chunks):
        last = ci == tchain.n_chunks - 1
        in_metas = (None if ci == 0 else tchain.bound_metas[ci - 1])

        def kernel(*refs, _ci=ci, _in_metas=in_metas):
            const_refs = refs[:sf.n_consts]
            lit_vals, pre = sf._cvals([cr[...] for cr in const_refs])
            pos = sf.n_consts
            b_r = refs[pos]; pos += 1
            packed = jax.lax.squeeze(b_r[...], (1,))
            env = dict(zip(ch.pneeds[_ci],
                           unpack_rows(packed, ch.pneeds_meta[_ci], bt)))
            envb = {v: True for v in env}
            if _ci > 0:
                tb_r = refs[pos]; pos += 1
                tpacked = jax.lax.squeeze(tb_r[...], (1, 2))
                for v, val in zip(tchain.bounds[_ci - 1],
                                  unpack_rows(tpacked, _in_metas, bt)):
                    env[v] = val
                    envb[v] = True
            bas_r = refs[pos]; pos += 1
            bb = bas_r[...]
            ct = jax.lax.reshape(
                jax.lax.slice(bb, (0, 0, 0), (1, 1, nq)), (nq,))
            env[targs[0]] = ct
            envb[targs[0]] = False
            outs = tchain.eval_chunk(_ci, env, envb, bt, lit_vals, pre)
            if _ci == tchain.n_chunks - 1:
                refs[-1][...] = jax.lax.expand_dims(outs[0], (1, 2))
            else:
                metas = tchain.bound_metas[_ci]
                refs[-1][...] = jax.lax.expand_dims(
                    pack_rows(outs, metas, bt), (1, 2))

        in_specs = [_const_spec(c) for c in sf.consts2d] + [
            pl.BlockSpec((ch.pneeds_rows[ci], 1, S_b, 128),
                         lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)]
        ins = list(sf.consts2d) + [primal_packs[ci]]
        if ci > 0:
            rows_in = tchain.bound_rows[ci - 1]
            in_specs += [pl.BlockSpec(
                (rows_in, 1, 1, S_b, 128), lambda i, k: (0, i, k, 0, 0),
                memory_space=pltpu.VMEM)]
            ins += [cur_t]
        in_specs += [bas_spec]
        ins += [bas]
        if last:
            out_spec = pl.BlockSpec(
                (no, 1, 1, S_b, 128), lambda i, k: (0, i, k, 0, 0),
                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((no, G, nq, S_b, 128), dtype)
        else:
            rows_out = tchain.bound_rows[ci]
            out_spec = pl.BlockSpec(
                (rows_out, 1, 1, S_b, 128), lambda i, k: (0, i, k, 0, 0),
                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct(
                (rows_out, G, nq, S_b, 128), jnp.float32)
        cur_t = pl.pallas_call(
            kernel,
            grid=(G, nq),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*ins)

    t_p = cur_t
    rows = jnp.transpose(t_p, (1, 3, 4, 2, 0)).reshape(N_pad, nq, no)
    rows = rows[:N].reshape(B, T, nq, no)
    fx_bot = rows[..., :nx]
    fu_bot = rows[..., nx:]
    dt = jnp.asarray(model.dt, dtype)
    eye = jnp.eye(nq, dtype=dtype)
    top = jnp.concatenate([eye, dt * eye], axis=-1)
    fx_top = jnp.broadcast_to(top, (B, T, nq, nx))
    fu_top = jnp.zeros((B, T, nq, na), dtype)
    fx = jnp.concatenate([fx_top, fx_bot], axis=2)
    fu = jnp.concatenate([fu_top, fu_bot], axis=2)
    return fx, fu


# ---------------------------------------------------------------------------
# Chained step rollout: the frozen step as a chain of kernels inside an
# XLA scan over time (per-step launches; "a measured number" beats "does
# not compile" at humanoid scale)
# ---------------------------------------------------------------------------


def _step_chain_for(model, m_cl, nx, na, dtype, cg_iters, budget,
                    with_gains: bool):
    from nimblephysics_tpu.ops.pallas_linearize import (
        _tau_stack, dyn_frozen_for_trace)

    key = ("step", id(model), m_cl, nx, na, jnp.dtype(dtype).name,
           cg_iters, budget, with_gains)
    hit = _CHAIN_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    with jax.ensure_compile_time_eval():
        dynf = dyn_frozen_for_trace(model, cg_iters=cg_iters)

        idx = np.asarray(model.actuated, dtype=np.int32)
        u_lo = jnp.asarray(model.tau_lower)[idx]
        u_hi = jnp.asarray(model.tau_upper)[idx]

        z = lambda n: jnp.zeros(n, dtype)  # noqa: E731
        if with_gains:
            def step_fn(x, xref, uref, Ktf, kt, cm, usv, alpha):
                du = alpha * kt + Ktf.reshape(na, nx) @ (x - xref)
                uu = jnp.clip(uref + du, u_lo, u_hi)
                return dynf(x, uu, cm, usv), uu

            args = (z(nx), z(nx), z(na), z(na * nx), z(na), z(m_cl),
                    z(m_cl), jnp.zeros((), dtype))
        else:
            def step_fn(x, uu, cm, usv):
                return dynf(x, jnp.clip(uu, u_lo, u_hi), cm, usv)

            args = (z(nx), z(na), z(m_cl), z(m_cl))
        sf = SplitJVPFn(step_fn, args, n_tangent=0)
    chain = LaneChain(sf.primal_view.eqns, sf.primal_view.invars,
                      [True] * len(sf.primal_view.invars),
                      sf.bound_vars, budget)
    out = (sf, chain)
    _CHAIN_CACHE[key] = (model, out)
    return out


def _run_chain_lanes(sf, chain, args_lanes, arg_rows, G, S_b, interpret):
    """Run a (G,)-grid chain over lane-packed args; returns the final
    pack (out_rows, G, S_b, 128)."""
    bt = (S_b, 128)
    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, 1, S_b, 128), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    invars = sf.primal_view.invars
    cur = None
    for ci in range(chain.n_chunks):
        last = ci == chain.n_chunks - 1
        in_metas = (None if ci == 0 else chain.bound_metas[ci - 1])
        out_metas = (sf.bound_meta if last else chain.bound_metas[ci])
        out_rows = (sf.n_boundary_f32 if last else chain.bound_rows[ci])
        in_vars = (invars if ci == 0 else chain.bounds[ci - 1])

        def kernel(*refs, _ci=ci, _in_metas=in_metas, _out_metas=out_metas,
                   _in_vars=in_vars):
            const_refs = refs[:sf.n_consts]
            lit_vals, pre = sf._cvals([cr[...] for cr in const_refs])
            if _ci == 0:
                arg_refs = refs[sf.n_consts:-1]
                vals = [jax.lax.squeeze(r[...], (1,)) for r in arg_refs]
            else:
                b_r = refs[sf.n_consts]
                packed = jax.lax.squeeze(b_r[...], (1,))
                vals = unpack_rows(packed, _in_metas, bt)
            env = dict(zip(_in_vars, vals))
            envb = {v: True for v in _in_vars}
            outs = chain.eval_chunk(_ci, env, envb, bt, lit_vals, pre)
            refs[-1][...] = jax.lax.expand_dims(
                pack_rows(outs, _out_metas, bt), (1,))

        in_specs = [_const_spec(c) for c in sf.consts2d]
        ins = list(sf.consts2d)
        if ci == 0:
            in_specs += [lane_spec(r) for r in arg_rows]
            ins += list(args_lanes)
        else:
            in_specs += [lane_spec(chain.bound_rows[ci - 1])]
            ins += [cur]
        cur = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=lane_spec(out_rows),
            out_shape=jax.ShapeDtypeStruct((out_rows, G, S_b, 128),
                                           jnp.float32),
            interpret=interpret,
        )(*ins)
    return cur


def chained_step_rollout(
    model,
    running_cost,
    x0: jax.Array,       # (B, nx)
    u: jax.Array,        # (B, T, na)
    classes,             # (cmask, us) each (B, T, m)
    block_b: int = 128,
    interpret: bool = None,
    cg_iters: int = None,
    budget: int = 36_000,
):
    """Open-loop frozen rollout via the chained step kernels, scanned
    over T in XLA (per-step kernel launches — humanoid-scale fallback
    where the one-kernel `rollout_gains_pallas` exceeds the envelope).
    Returns (xs (B, T+1, nx), cost (B,))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, na = u.shape
    nx = x0.shape[-1]
    m_cl = classes[0].shape[-1]
    dtype = x0.dtype
    sf, chain = _step_chain_for(model, m_cl, nx, na, dtype, cg_iters,
                                budget, with_gains=False)
    block_b = max(128, (block_b // 128) * 128)
    S_b = block_b // 128
    N_pad = -(-B // block_b) * block_b
    G = N_pad // block_b

    def lanes(a2):
        aT = a2.T
        if N_pad != B:
            aT = jnp.pad(aT, ((0, 0), (0, N_pad - B)))
        return aT.reshape(aT.shape[0], G, S_b, 128)

    ts = jnp.arange(T)

    def body(xf, inp):
        u_t, cm_t, us_t, t = inp
        pack = _run_chain_lanes(
            sf, chain, [lanes(xf), lanes(u_t), lanes(cm_t), lanes(us_t)],
            [nx, na, m_cl, m_cl], G, S_b, interpret)
        x2 = pack.reshape(nx, N_pad)[:, :B].T
        c = jax.vmap(running_cost, in_axes=(0, 0, None))(xf, u_t, t)
        return x2, (x2, c)

    xT, (xs, cs) = jax.lax.scan(
        body, x0,
        (u.swapaxes(0, 1), classes[0].swapaxes(0, 1),
         classes[1].swapaxes(0, 1), ts))
    xs = jnp.concatenate([x0[None], xs], axis=0).swapaxes(0, 1)
    return xs, jnp.sum(cs, axis=0)

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

import os
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


def inline_linear_solves(eqns: Sequence[Any], out_vars: Sequence[Any]):
    """Splice every `custom_linear_solve` equation's SOLVE sub-jaxpr into
    the flat list (forward semantics — exactly what `lane_eval` executes
    for it; the chains are forward-only and JAX already applied the AD
    rules). Without this the whole unrolled CG solve is ONE atomic
    ~25k-op equation the chain splitter cannot cut — at Atlas scale that
    single chunk alone exceeds the compile envelope (round-5 bisect).
    Returns (new_eqns, new_out_vars); downstream references to the solve
    outputs are rewritten to the spliced values."""
    try:
        from jax._src.core import Var as _Var
    except Exception:  # pragma: no cover
        from jax.core import Var as _Var  # type: ignore

    env: Dict[Any, Any] = {}

    def lk(v):
        if isinstance(v, Literal):
            return v
        return env.get(v, v)

    out: List[Any] = []
    for eqn in eqns:
        if eqn.primitive.name != "custom_linear_solve":
            out.append(eqn.replace(invars=[lk(v) for v in eqn.invars]))
            continue
        cl = eqn.params["const_lengths"]
        js = eqn.params["jaxprs"]
        ofs = cl.matvec + cl.vecmat
        sol_ins = eqn.invars[ofs: ofs + cl.solve]
        b_ins = eqn.invars[ofs + cl.solve + cl.transpose_solve:]
        sub = js.solve
        senv: Dict[Any, Any] = {}
        for cv, c in zip(sub.jaxpr.constvars, sub.consts):
            senv[cv] = Literal(c, cv.aval)
        for sv, val in zip(sub.jaxpr.invars,
                           [lk(v) for v in list(sol_ins) + list(b_ins)]):
            senv[sv] = val

        def slk(v):
            if isinstance(v, Literal):
                return v
            return senv.get(v, v)

        for se in sub.jaxpr.eqns:
            new_outs = [_Var(ov.aval) for ov in se.outvars]
            out.append(se.replace(invars=[slk(v) for v in se.invars],
                                  outvars=new_outs))
            for ov, no in zip(se.outvars, new_outs):
                senv[ov] = no
        for ov, so in zip(eqn.outvars, sub.jaxpr.outvars):
            env[ov] = slk(so)
    return out, [lk(v) for v in out_vars]


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
        self._order = order
        self._remat_pass()

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

    def _remat_pass(self):
        """Boundary remat: duplicate cheap producers into the consumer
        chunk when shipping their INPUTS across the cut is smaller than
        shipping their outputs (e.g. an (m, m) transpose or mask product
        re-derived from the (m, m) source it sits next to, or from
        (m,)-vectors). At humanoid scale the mid-CG boundaries otherwise
        carry the whole Qf/QfT/R matrix cohort (~60k floats/point —
        double-buffered boundary blocks alone exceed VMEM). Re-run after
        ANY boundary recomputation (retarget_outputs does — recomputed
        liveness resurrects vars whose duplicates already exist
        downstream)."""
        import numpy as _np

        def nel(v):
            return int(_np.prod(v.aval.shape))

        batched = self.batched
        order = self._order
        if not hasattr(self, "_remat_done"):
            self._remat_done = set()
        invar_set = {v for v, b in zip(self.in_vars, self.in_batched) if b}
        for ci in range(len(self.bounds)):
            bset = set(self.bounds[ci])
            prev_b = set(self.bounds[ci - 1]) if ci > 0 else set()
            produced_in_ci = set()
            for eqn in self.chunks[ci]:
                produced_in_ci.update(eqn.outvars)
            moved: List[Any] = []
            moved_cost = 0
            for eqn in reversed(self.chunks[ci]):
                if moved_cost > 4000:
                    break
                if (id(eqn), ci) in self._remat_done:
                    continue
                outs_in_b = [ov for ov in eqn.outvars if ov in bset]
                if not outs_in_b:
                    continue
                need, ok = [], True
                for iv in eqn.invars:
                    if (isinstance(iv, Literal) or iv in self.extern
                            or iv not in batched or iv in bset
                            or iv in need):
                        continue
                    avail = (iv in produced_in_ci or iv in prev_b
                             or (ci == 0 and iv in invar_set))
                    if not avail:
                        ok = False
                        break
                    need.append(iv)
                if not ok:
                    continue
                gain = sum(nel(ov) for ov in outs_in_b)
                cost = sum(nel(iv) for iv in need)
                if gain <= cost:
                    continue
                for ov in outs_in_b:
                    bset.discard(ov)
                for iv in need:
                    bset.add(iv)
                moved.append(eqn)
                self._remat_done.add((id(eqn), ci))
                moved_cost += emit_cost(eqn)
            if moved:
                # duplicates prepend in ORIGINAL order (moved-eqn chains
                # stay dependency-consistent; reverse iteration collected
                # them backwards); a second pass may re-prepend an
                # identical duplicate — harmless (liveness keeps one)
                self.chunks[ci + 1] = (list(reversed(moved))
                                       + self.chunks[ci + 1])
                bv = [v for v in bset]
                bv.sort(key=lambda v: (order.get(v, -1), str(v)))
                self.bounds[ci] = bv

    @property
    def n_chunks(self) -> int:
        return len(self.chunks)

    def retarget_outputs(self, groups: Sequence[Sequence[Any]]) -> List[int]:
        """Re-plan output emission: instead of every out group leaving the
        LAST chunk, each group leaves the earliest chunk where all its
        vars exist, and the boundaries are recomputed for that flow. At
        humanoid scale the tangent chunks' primal cohorts (Qf and friends,
        ~40k floats) otherwise ride every later cut — the round-5 measured
        cause of the 53k-row mid-CG boundaries. Returns the per-group
        emission chunk indices; self.bounds/bound_metas/bound_rows are
        rewritten."""
        def nel(v):
            return int(np.prod(v.aval.shape))

        birth_chunk: Dict[Any, int] = {}
        for v, b in zip(self.in_vars, self.in_batched):
            if b:
                birth_chunk[v] = 0
        for i, ch in enumerate(self.chunks):
            for e in ch:
                for ov in e.outvars:
                    birth_chunk.setdefault(ov, i)
        last_use: Dict[Any, int] = {}
        for i, ch in enumerate(self.chunks):
            for e in ch:
                for v in e.invars:
                    if not isinstance(v, Literal) and v in self.batched:
                        last_use[v] = i
        gsets = [set(g) for g in groups]
        emit = [max((birth_chunk.get(v, 0) for v in g), default=0)
                for g in groups]
        member = {}
        for j, gs in enumerate(gsets):
            for v in gs:
                member.setdefault(v, []).append(j)
        new_bounds = []
        for ci in range(self.n_chunks - 1):
            bv = []
            for v in self.batched:
                if v in self.extern or nel(v) == 0:
                    continue
                b = birth_chunk.get(v)
                if b is None or b > ci:
                    continue
                alive = last_use.get(v, -1) > ci or any(
                    emit[j] > ci for j in member.get(v, ()))
                if alive:
                    bv.append(v)
            bv.sort(key=lambda v: (birth_chunk.get(v, -1), str(v)))
            new_bounds.append(bv)
        self.bounds = new_bounds
        self._remat_pass()
        self.bound_metas = [
            [(tuple(v.aval.shape), v.aval.dtype, nel(v)) for v in bv]
            for bv in self.bounds
        ]
        self.bound_rows = [sum(m[2] for m in metas)
                           for metas in self.bound_metas]
        return emit

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
                   lit_vals, pre_env, outs=None) -> List[jax.Array]:
        """Evaluate chunk `idx` given an env holding its input vars;
        returns the values of this chunk's out list (boundary vars, or
        the program out_vars for the last chunk; `outs` overrides —
        retargeted-emission launchers pass boundary + group vars)."""
        if outs is None:
            outs = (self.bounds[idx] if idx < self.n_chunks - 1
                    else self.out_vars)
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


class _EmitUnit(NamedTuple):
    """One primal→tangent pack: ALL tangent-needed primal vars BORN in
    primal chunk `ci`, emitted right there (per-birth emission, deduped
    across tangent consumers) — so no (m, m) cohort ever rides a later
    cut or ships twice."""

    ci: int                 # primal chunk that emits this pack
    vars_p: Tuple[Any, ...]   # primal-side vars (pack order)
    vars_t: Tuple[Any, ...]   # the same vars as the tangent side names them
    metas: Tuple[Tuple, ...]
    rows: int


class _VJPChains(NamedTuple):
    sf: Any
    pchain: LaneChain
    tchain: LaneChain
    units: Tuple[_EmitUnit, ...]
    tneed: Tuple[Tuple[int, ...], ...]   # unit indices per tangent chunk


def _chains_for(model, m_cl, nx, na, dtype, cg_iters, budget):
    from nimblephysics_tpu.ops.pallas_linearize import _vjp_fn_for

    key = ("chain", id(model), m_cl, nx, na, jnp.dtype(dtype).name,
           cg_iters, budget)
    hit = _CHAIN_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    sf = _vjp_fn_for(model, m_cl, nx, na, dtype, cg_iters=cg_iters)
    targs = sf.tangent_view.invars[len(sf.bound_vars):]
    t_eqns, t_out = inline_linear_solves(sf.tangent_view.eqns,
                                         sf.tangent_view.outvars)
    tchain = LaneChain(t_eqns, sf.tangent_view.invars,
                       [True] * len(sf.bound_vars) + [False] * len(targs),
                       t_out, budget,
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
    p_eqns, p_union = inline_linear_solves(sf.primal_view.eqns, union)
    p_map = dict(zip(union, p_union))
    pchain = LaneChain(p_eqns, sf.primal_view.invars,
                       [True] * len(sf.primal_view.invars),
                       p_union, budget)
    # every pack var leaves at its BIRTH chunk (per-birth emission
    # units); boundaries then carry only real equation liveness — with
    # one whole pack per tangent chunk the (m, m) cohort rode every cut
    # after assembly (53k rows measured at Atlas scale), and with
    # last-chunk emission it rode them all
    pchain.retarget_outputs([])

    def nel(v):
        return int(np.prod(v.aval.shape))

    birth: Dict[Any, int] = {}
    for v in sf.primal_view.invars:
        birth[v] = 0
    for i, chk in enumerate(pchain.chunks):
        for e in chk:
            for ov in e.outvars:
                birth.setdefault(ov, i)
    per_ci: Dict[int, List[Tuple[Any, Any]]] = {}
    seen_vt: Dict[Any, int] = {}
    tneed_sets: List[set] = [set() for _ in range(tchain.n_chunks)]
    for j, grp_t in enumerate(pneeds):
        for vt in grp_t:
            ci = seen_vt.get(vt)
            if ci is None:
                vp = p_map[vt]
                ci = birth[vp]
                seen_vt[vt] = ci
                per_ci.setdefault(ci, []).append((vt, vp))
            tneed_sets[j].add(ci)
    units: List[_EmitUnit] = []
    ci_to_unit: Dict[int, int] = {}
    for ci in sorted(per_ci):
        pairs = per_ci[ci]
        metas = tuple((tuple(vp.aval.shape), vp.aval.dtype, nel(vp))
                      for _, vp in pairs)
        ci_to_unit[ci] = len(units)
        units.append(_EmitUnit(
            ci=ci,
            vars_p=tuple(vp for _, vp in pairs),
            vars_t=tuple(vt for vt, _ in pairs),
            metas=metas, rows=sum(m[2] for m in metas)))
    tneed = tuple(tuple(sorted(ci_to_unit[c] for c in ts_))
                  for ts_ in tneed_sets)
    out = _VJPChains(sf, pchain, tchain, tuple(units), tneed)
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
    wrap=None,
) -> Tuple[jax.Array, jax.Array]:
    """(fx, fu) via the CHAINED row-VJP kernels — for models whose split
    halves exceed the Mosaic envelope (Atlas-class). Same math as
    `linearize_pallas_vjp`; each half runs as a chain of kernels.

    `wrap(name, launch_fn) -> launch_fn`: optional per-launch wrapper.
    Host-orchestrated drivers pass a caching `jax.jit` wrapper so every
    pallas launch compiles as its OWN program (the remote compile
    service crashes on large multi-kernel programs; individual kernels
    compile — scripts/atlas_mpc_hosted.py)."""
    if wrap is None:
        wrap = lambda name, f: f  # noqa: E731
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

    # ---- primal chain: grid (G,); each chunk writes its boundary pack
    # PLUS the emission units whose vars are born in it (per-birth
    # retargeted emission: no pack var ever rides a later cut). Unit
    # vars that ALSO ride this chunk's boundary (the Qf cohort: born at
    # assembly, consumed by both the later CG chunks and the tangent
    # side) are NOT written twice: the kernel emits only the
    # boundary-disjoint remainder and the full unit pack is reassembled
    # outside the kernel from boundary-pack row slices — the round-5
    # p6 crash was exactly this doubled output volume (~36 MB of
    # output blocks; BIGMODEL_STUDY.md round-5 update). ----
    unit_packs: Dict[int, Any] = {}
    L = max((u.ci for u in ch.units), default=0)
    cur = None  # packed boundary from the previous chunk
    for ci in range(L + 1):
        last = ci == L
        in_metas = (None if ci == 0 else pchain.bound_metas[ci - 1])
        in_vars = (p_invars if ci == 0 else pchain.bounds[ci - 1])
        emit_here = [ui for ui, u in enumerate(ch.units) if u.ci == ci]
        with_bound = not last

        # per-unit split: vars already in this chunk's boundary pack
        # (sliced out after launch) vs the remainder the kernel emits
        bset_ci = set(pchain.bounds[ci]) if with_bound else set()
        boff: Dict[Any, int] = {}
        off = 0
        if with_bound:
            for v, (_, _, n) in zip(pchain.bounds[ci],
                                    pchain.bound_metas[ci]):
                boff[v] = off
                off += n
        kept: Dict[int, Tuple[Tuple[Any, ...], Tuple[Tuple, ...], int]] = {}
        for ui in emit_here:
            u_ = ch.units[ui]
            kv, km = [], []
            for vp, meta in zip(u_.vars_p, u_.metas):
                if vp not in bset_ci:
                    kv.append(vp)
                    km.append(meta)
            kept[ui] = (tuple(kv), tuple(km), sum(m[2] for m in km))
        emit_out = [ui for ui in emit_here if kept[ui][2] > 0]

        in_specs = [_const_spec(c) for c in sf.consts2d]
        ins = list(sf.consts2d)
        if ci == 0:
            in_specs += arg_specs
            ins += args_in
        else:
            in_specs += [lane_spec(pchain.bound_rows[ci - 1])]
            ins += [cur]

        def make_env(refs, _ci, _in_metas, _in_vars):
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
            return env, envb, lit_vals, pre

        brows_ci = pchain.bound_rows[ci] if with_bound else 0
        rows_tot = brows_ci + sum(kept[ui][2] for ui in emit_out)
        # the remote compile helper dies on large per-invocation OUTPUT
        # blocks (round-5 p6: 25 MB crashes, the 7 MB p7 boundary
        # compiles) — chunks over the segment cap emit through MULTIPLE
        # launches, each re-running the chunk's (cheap, primal-side)
        # compute and writing one <=SEG_ROWS row window of the flat
        # [boundary pack | unit packs] row space
        seg_rows = int(os.environ.get("NTPU_CHAIN_OUT_SEG_ROWS", "14336"))
        if rows_tot > seg_rows:
            layout: List[Tuple[Any, Tuple, int]] = []
            off_r = 0
            if with_bound:
                for v, meta in zip(pchain.bounds[ci],
                                   pchain.bound_metas[ci]):
                    layout.append((v, meta, off_r))
                    off_r += meta[2]
            for ui in emit_out:
                for v, meta in zip(kept[ui][0], kept[ui][1]):
                    layout.append((v, meta, off_r))
                    off_r += meta[2]
            segs = [(lo, min(lo + seg_rows, rows_tot))
                    for lo in range(0, rows_tot, seg_rows)]
            seg_rets = []
            for si, (lo, hi) in enumerate(segs):
                sel = tuple((v, meta, glo) for v, meta, glo in layout
                            if glo < hi and glo + meta[2] > lo)

                def kernel(*refs, _ci=ci, _in_metas=in_metas,
                           _in_vars=in_vars, _sel=sel, _lo=lo, _hi=hi):
                    env, envb, lit_vals, pre = make_env(
                        refs, _ci, _in_metas, _in_vars)
                    outs = pchain.eval_chunk(
                        _ci, env, envb, bt, lit_vals, pre,
                        outs=[v for v, _, _ in _sel])
                    parts = []
                    for (v, meta, glo), val in zip(_sel, outs):
                        n = meta[2]
                        p = pack_rows([val], [meta], bt)
                        a = max(_lo, glo) - glo
                        b = min(_hi, glo + n) - glo
                        if a > 0 or b < n:
                            p = jax.lax.slice_in_dim(p, a, b, axis=0)
                        parts.append(p)
                    full = (parts[0] if len(parts) == 1
                            else jax.lax.concatenate(parts, 0))
                    refs[-1][...] = jax.lax.expand_dims(full, (1,))

                def launch(*a, _k=kernel, _isp=tuple(in_specs),
                           _rows=hi - lo):
                    return pl.pallas_call(
                        _k,
                        grid=(G,),
                        in_specs=list(_isp),
                        out_specs=[lane_spec(_rows)],
                        out_shape=[jax.ShapeDtypeStruct(
                            (_rows, G, S_b, 128), jnp.float32)],
                        interpret=interpret,
                    )(*a)

                seg_rets.append(wrap(f"p{ci}s{si}", launch)(*ins)[0])
            full = (seg_rets[0] if len(seg_rets) == 1
                    else jnp.concatenate(seg_rets, axis=0))
            if with_bound:
                cur = jax.lax.slice_in_dim(full, 0, brows_ci, axis=0)
            red = {}
            off_r = brows_ci
            for ui in emit_out:
                red[ui] = jax.lax.slice_in_dim(
                    full, off_r, off_r + kept[ui][2], axis=0)
                off_r += kept[ui][2]
        else:
            def kernel(*refs, _ci=ci, _in_metas=in_metas, _in_vars=in_vars,
                       _emit=tuple(emit_out), _wb=with_bound, _kept=kept):
                env, envb, lit_vals, pre = make_env(
                    refs, _ci, _in_metas, _in_vars)
                outs_vars = (list(pchain.bounds[_ci]) if _wb else [])
                for ui in _emit:
                    outs_vars += list(_kept[ui][0])
                outs = pchain.eval_chunk(_ci, env, envb, bt, lit_vals, pre,
                                         outs=outs_vars)
                n_out = (1 if _wb else 0) + len(_emit)
                out_refs = refs[-n_out:]
                pos = 0
                ri = 0
                if _wb:
                    nb_ = len(pchain.bounds[_ci])
                    out_refs[ri][...] = jax.lax.expand_dims(
                        pack_rows(outs[:nb_], pchain.bound_metas[_ci], bt),
                        (1,))
                    pos += nb_
                    ri += 1
                for ui in _emit:
                    kv, km, _ = _kept[ui]
                    out_refs[ri][...] = jax.lax.expand_dims(
                        pack_rows(outs[pos: pos + len(kv)], km, bt), (1,))
                    pos += len(kv)
                    ri += 1

            out_specs = ([lane_spec(pchain.bound_rows[ci])] if with_bound
                         else [])
            out_shape = ([jax.ShapeDtypeStruct(
                (pchain.bound_rows[ci], G, S_b, 128), jnp.float32)]
                if with_bound else [])
            out_specs += [lane_spec(kept[ui][2]) for ui in emit_out]
            out_shape += [jax.ShapeDtypeStruct(
                (kept[ui][2], G, S_b, 128), jnp.float32)
                for ui in emit_out]

            def launch(*a, _k=kernel, _isp=tuple(in_specs),
                       _osp=tuple(out_specs), _osh=tuple(out_shape)):
                return pl.pallas_call(
                    _k,
                    grid=(G,),
                    in_specs=list(_isp),
                    out_specs=list(_osp),
                    out_shape=list(_osh),
                    interpret=interpret,
                )(*a)

            rets = list(wrap(f"p{ci}", launch)(*ins))
            if with_bound:
                cur = rets.pop(0)
            red = dict(zip(emit_out, rets))
        for ui in emit_here:
            u_ = ch.units[ui]
            kv, km, krows = kept[ui]
            if krows == u_.rows:
                unit_packs[ui] = red[ui]
                continue
            # reassemble the full pack in unit row order: boundary rows
            # sliced from `cur`, remainder rows from the reduced pack
            parts = []
            k = 0
            for vp, (_, _, n) in zip(u_.vars_p, u_.metas):
                if vp in bset_ci:
                    o = boff[vp]
                    parts.append(
                        jax.lax.slice_in_dim(cur, o, o + n, axis=0))
                else:
                    parts.append(
                        jax.lax.slice_in_dim(red[ui], k, k + n, axis=0))
                    k += n
            unit_packs[ui] = (parts[0] if len(parts) == 1
                              else jnp.concatenate(parts, axis=0))

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
        units_j = list(ch.tneed[ci])

        def kernel(*refs, _ci=ci, _in_metas=in_metas,
                   _units=tuple(units_j)):
            const_refs = refs[:sf.n_consts]
            lit_vals, pre = sf._cvals([cr[...] for cr in const_refs])
            pos = sf.n_consts
            env = {}
            envb = {}
            for ui in _units:
                u_ = ch.units[ui]
                packed = jax.lax.squeeze(refs[pos][...], (1,)); pos += 1
                for v, val in zip(u_.vars_t,
                                  unpack_rows(packed, u_.metas, bt)):
                    env[v] = val
                    envb[v] = True
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
            pl.BlockSpec((ch.units[ui].rows, 1, S_b, 128),
                         lambda i, k: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
            for ui in units_j]
        ins = list(sf.consts2d) + [unit_packs[ui] for ui in units_j]
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

        idx = np.asarray(model.actuated, dtype=np.int32)  # noqa: F841
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
    eqns2, out2 = inline_linear_solves(sf.primal_view.eqns, sf.bound_vars)
    chain = LaneChain(eqns2, sf.primal_view.invars,
                      [True] * len(sf.primal_view.invars),
                      out2, budget)
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
        x2 = pack.reshape(nx, N_pad)[:, :B].T.astype(xf.dtype)
        c = jax.vmap(running_cost, in_axes=(0, 0, None))(xf, u_t, t)
        return x2, (x2, c)

    xT, (xs, cs) = jax.lax.scan(
        body, x0,
        (u.swapaxes(0, 1), classes[0].swapaxes(0, 1),
         classes[1].swapaxes(0, 1), ts))
    xs = jnp.concatenate([x0[None], xs], axis=0).swapaxes(0, 1)
    return xs, jnp.sum(cs, axis=0)

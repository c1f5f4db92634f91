"""Mechanical primal/tangent split of a JVP jaxpr — the two-kernel
contact linearize design.

The frozen-contact step's JVP graph (`ops/pallas_linearize.py` `jvp_fn`)
exceeds the Mosaic compile envelope for the bench LCP sizes: the union of
the tangent-solve cone and the mass-matrix cone crashes the compile helper
even though each half compiles alone (round-3 bisect, NOTES_ROUND3.md).
This module splits the JVP *mechanically on the jaxpr* into

  * a PRIMAL half: every equation with no data dependence on the tangent
    inputs (dx, du).  Lanes = trajectory points (B*T) — evaluated ONCE per
    point instead of once per (point, direction) pair, killing the K-fold
    primal redundancy of the monolithic JVP kernel; and
  * a TANGENT half: the remaining equations — all LINEAR in the tangents.
    Lanes = points again, with the K basis directions walked by a second
    Pallas grid dimension (the per-point boundary block is revisited with
    an unchanged index, so Pallas fetches it once per point-block).

The two halves communicate through the BOUNDARY: the primal values the
tangent equations consume, packed into one flat f32 tensor per point
(measured for the half-cheetah: 685 vars / ~7k floats per point ≈ 2.9 GB
per linearize at B=1024, H=100 — ~7 ms of HBM traffic vs the ~2.6 s/iter
hybrid XLA linearize it replaces).

Tangent-dependence is propagated through a FLAT jaxpr: call-style
equations (pjit of inner helpers, custom_jvp remnants) are inlined first —
a single multi-output call eqn computing both a primal and a tangent
output would otherwise taint its primal outputs and drag the whole primal
graph (mass matrix, contact assembly, the primal CG solve) into the
tangent kernel, recreating exactly the union-cone kernel that does not
compile.  `custom_linear_solve` stays atomic: JAX has already applied its
JVP rule by the time this jaxpr exists, leaving one primal-solve eqn
(classified primal) and one implicit-tangent-solve eqn (classified
tangent, consuming the primal solution through the boundary) — see
`ops/frozen_contact.solve_frozen`.

Reference analogue: BackpropSnapshot assembles the per-step Jacobians
from the *saved primal factorization* of the forward LCP
(/root/reference/dart/neural/BackpropSnapshot.cpp:2723-2774 — the primal
solve happens once, the per-direction work reuses it).  This module is
the same primal-reuse structure derived mechanically from the traced step.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import core as jcore

try:
    from jax._src.core import Literal, Var
except Exception:  # pragma: no cover
    from jax.core import Literal, Var  # type: ignore

from nimblephysics_tpu.ops.lanevmap import (
    BShape,
    _bt,
    _lit_key,
    collect_array_literals,
    hoist_unbatched,
    lane_eval,
)

# Call-style primitives flattened by `inline_calls`. `custom_linear_solve`
# is deliberately absent (kept atomic; lane_eval forward-runs its solve
# sub-jaxpr and the taint classification treats it as one equation).
_CALL_PRIMS = {
    "jit", "pjit", "closed_call", "core_call", "xla_call",
    "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr",
}


def _get_sub(eqn) -> Tuple[Any, List[Any]]:
    sub = (eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
           or eqn.params.get("fun_jaxpr"))
    sub_jaxpr = sub.jaxpr if hasattr(sub, "jaxpr") else sub
    sub_consts = list(sub.consts) if hasattr(sub, "consts") else []
    return sub_jaxpr, sub_consts


def inline_calls(closed: jcore.ClosedJaxpr) -> jcore.Jaxpr:
    """Flatten call-style eqns into one flat equation list (fresh outvars
    per inline instance — the same sub-jaxpr may be called repeatedly).
    Inner closed-jaxpr constants become Literal invars, which the existing
    `collect_array_literals`/`hoist_unbatched` machinery already handles."""
    out_eqns: List[Any] = []

    def run(jaxpr, env: Dict[Any, Any]):
        def lk(v):
            if isinstance(v, Literal):
                return v
            return env.get(v, v)

        for eqn in jaxpr.eqns:
            if eqn.primitive.name in _CALL_PRIMS:
                sub_jaxpr, sub_consts = _get_sub(eqn)
                ivals = [lk(v) for v in eqn.invars]
                # custom_jvp_call-style eqns may carry leading const args
                n_extra = len(ivals) - len(sub_jaxpr.invars)
                assert n_extra >= 0, "call eqn with fewer invars than sub"
                sub_env: Dict[Any, Any] = {}
                for cv, c in zip(sub_jaxpr.constvars, sub_consts):
                    sub_env[cv] = Literal(c, cv.aval)
                for sv, val in zip(sub_jaxpr.invars, ivals[n_extra:]):
                    sub_env[sv] = val
                outs = run(sub_jaxpr, sub_env)
                for ov, o in zip(eqn.outvars, outs):
                    env[ov] = o
            else:
                new_outs = [Var(ov.aval) for ov in eqn.outvars]
                out_eqns.append(
                    eqn.replace(invars=[lk(v) for v in eqn.invars],
                                outvars=new_outs)
                )
                for ov, no in zip(eqn.outvars, new_outs):
                    env[ov] = no
        return [lk(v) for v in jaxpr.outvars]

    env: Dict[Any, Any] = {}
    outs = run(closed.jaxpr, env)
    return closed.jaxpr.replace(eqns=out_eqns, outvars=outs)


class _JaxprView(NamedTuple):
    """The attribute subset of Jaxpr that `lane_eval` reads — lets the
    primal/tangent halves share the original Var objects without
    constructing real Jaxpr instances."""

    constvars: list
    invars: list
    outvars: list
    eqns: list


class SplitJVPFn:
    """A JVP function traced once at per-point shapes and split into a
    primal and a tangent lane program (see module docstring).

    Host side: `consts2d` — shared unbatched kernel inputs (hoisted const
    boundary + array literals), passed to BOTH kernels.  `n_boundary_f32`
    — rows of the packed per-point boundary tensor.  Kernel side:
    `call_primal(cvals, primal_args, B)` -> packed boundary (nb, *B);
    `call_tangent(cvals, boundary, tangent_args, B)` -> outputs, where the
    tangent args (basis directions) are UNBATCHED traced vectors shared by
    every lane of the block.
    """

    def __init__(self, fn, example_args: Sequence[Any], n_tangent: int):
        closed = jax.make_jaxpr(fn)(*example_args)
        jaxpr = inline_calls(closed)
        n_args = len(example_args)
        self.n_primal_args = n_args - n_tangent
        self.n_tangent_args = n_tangent

        bvars, bvals = hoist_unbatched(jaxpr, closed.consts, [True] * n_args)
        self.empty = [(v, jnp.asarray(b)) for v, b in zip(bvars, bvals)
                      if jnp.asarray(b).size == 0]
        kept = [(v, jnp.asarray(b)) for v, b in zip(bvars, bvals)
                if jnp.asarray(b).size != 0]
        self.bvars = [v for v, _ in kept]
        self.literals = collect_array_literals(jaxpr)
        consts = [b for _, b in kept] + [jnp.asarray(l) for l in self.literals]
        self.meta = [(c.shape, c.dtype) for c in consts]
        from nimblephysics_tpu.ops.lanevmap import LaneFn
        self.consts2d = [LaneFn.to2d(c) for c in consts]
        self.n_boundary_consts = len(kept)

        # --- batched set (mirrors hoist_unbatched's classification) ---
        batched = set(jaxpr.invars)
        for eqn in jaxpr.eqns:
            if any((not isinstance(v, Literal)) and v in batched
                   for v in eqn.invars):
                batched.update(eqn.outvars)

        # --- tangent taint over the flat jaxpr ---
        tangent = set(jaxpr.invars[self.n_primal_args:])
        p_eqns, t_eqns = [], []
        for eqn in jaxpr.eqns:
            if not any((not isinstance(v, Literal)) and v in batched
                       for v in eqn.invars):
                continue  # unbatched: lives in pre_env for both halves
            if any((not isinstance(v, Literal)) and v in tangent
                   for v in eqn.invars):
                t_eqns.append(eqn)
                tangent.update(eqn.outvars)
            else:
                p_eqns.append(eqn)

        # --- boundary: batched primal vars the tangent half consumes ---
        bound: List[Any] = []
        seen = set()

        def want(v):
            if isinstance(v, Literal) or v in tangent or v not in batched:
                return
            if v not in seen:
                seen.add(v)
                bound.append(v)

        for eqn in t_eqns:
            for v in eqn.invars:
                want(v)
        for ov in jaxpr.outvars:  # primal outvars (none for a pure JVP)
            want(ov)

        # --- boundary shrink: greedy rematerialization ------------------
        # Move a primal eqn into the tangent program when recomputing it
        # per direction passes FEWER floats across the kernel boundary
        # than shipping its outputs (classic cut minimization on the
        # primal DAG; e.g. an (m, m) matrix assembled from an (m,) vector
        # ships m floats instead of m²). The primal kernel is untouched —
        # call_primal's liveness filter drops newly-dead equations. Flops
        # are the cheap resource here (the tangent kernel is HBM- and
        # VMEM-bound); growth of the tangent program is capped so the
        # Mosaic compile envelope that motivated the split is preserved.
        def nel(v):
            return int(np.prod(v.aval.shape))

        t_ids = {id(e) for e in t_eqns}
        producer = {}
        for eqn in p_eqns:
            for ov in eqn.outvars:
                producer[ov] = eqn
        bset = set(bound)
        moved: set = set()
        moved_eqns: List[Any] = []
        max_moves = max(200, len(t_eqns) // 2)
        for _ in range(4):  # passes until fixpoint (cascades upward)
            changed = False
            for eqn in reversed(p_eqns):
                if id(eqn) in moved or len(moved_eqns) >= max_moves:
                    continue
                if eqn.primitive.name == "custom_linear_solve":
                    continue  # never duplicate the primal solve
                outs_in_b = [ov for ov in eqn.outvars if ov in bset]
                if not outs_in_b:
                    continue
                gain = sum(nel(ov) for ov in outs_in_b)
                need = []
                for iv in eqn.invars:
                    if isinstance(iv, Literal) or iv in bset or iv not in batched:
                        continue
                    pe = producer.get(iv)
                    if pe is not None and id(pe) in moved:
                        continue  # already recomputed tangent-side
                    if iv not in need:
                        need.append(iv)
                cost = sum(nel(iv) for iv in need)
                if gain <= cost:
                    continue
                for ov in outs_in_b:
                    bset.discard(ov)
                for iv in need:
                    if nel(iv) > 0:
                        bset.add(iv)
                moved.add(id(eqn))
                moved_eqns.append(eqn)
                changed = True
            if not changed:
                break
        if moved:
            # boundary order: first appearance in the original eqn order
            order = {}
            for i, av in enumerate(jaxpr.invars):
                order[av] = (-1, i)
            for i, eqn in enumerate(jaxpr.eqns):
                for j, ov in enumerate(eqn.outvars):
                    order.setdefault(ov, (i, j))
            bound = sorted(bset, key=lambda v: order[v])
            t_eqns = [e for e in jaxpr.eqns
                      if id(e) in moved or id(e) in t_ids]
        self.n_moved = len(moved_eqns)

        def numel(v):
            return int(np.prod(v.aval.shape))

        self.bound_empty = [v for v in bound if numel(v) == 0]
        bound = [v for v in bound if numel(v) > 0]
        self.bound_vars = bound
        self.bound_meta = [(tuple(v.aval.shape), v.aval.dtype, numel(v))
                           for v in bound]
        for _, dt, _ in self.bound_meta:
            if not (jnp.issubdtype(dt, jnp.floating) or dt == jnp.bool_):
                raise NotImplementedError(
                    f"split boundary with non-float dtype {dt}"
                )
        self.n_boundary_f32 = sum(n for _, _, n in self.bound_meta)

        self.primal_view = _JaxprView([], list(jaxpr.invars[:self.n_primal_args]),
                                      list(bound), p_eqns)
        t_invars = list(bound) + list(jaxpr.invars[self.n_primal_args:])
        self.tangent_view = _JaxprView([], t_invars, list(jaxpr.outvars),
                                       t_eqns)
        self.n_eqns_primal = len(p_eqns)
        self.n_eqns_tangent = len(t_eqns)
        self.out_avals = [v.aval for v in jaxpr.outvars]

    @property
    def n_consts(self) -> int:
        return len(self.consts2d)

    def lane_flops_halves(self) -> Tuple[int, int]:
        """(primal, tangent) lane-flop estimates per point / per (point,
        direction) — the split-path analogue of `lanevmap.lane_flops`,
        used by bench.py's utilization accounting."""
        from nimblephysics_tpu.ops.lanevmap import lane_flops

        class _C:
            def __init__(self, eqns):
                self.jaxpr = _JaxprView([], [], [], eqns)

        return (lane_flops(_C(self.primal_view.eqns)),
                lane_flops(_C(self.tangent_view.eqns)))

    # -- shared helpers ---------------------------------------------------

    def _cvals(self, cvals2d):
        cvals = []
        for c, (shape, dt) in zip(cvals2d, self.meta):
            v = c.reshape(shape)
            if v.dtype != dt:
                v = v.astype(dt)
            cvals.append(v)
        lit_vals = {
            _lit_key(np.asarray(l)): v
            for l, v in zip(self.literals, cvals[self.n_boundary_consts:])
        }
        pre = dict(zip(self.bvars, cvals[:self.n_boundary_consts]))
        for v, e in self.empty:
            pre[v] = np.zeros(e.shape, e.dtype)
        for v in self.bound_empty:
            pre[v] = np.zeros(v.aval.shape, v.aval.dtype)
        return lit_vals, pre

    # -- kernel-side entry points -----------------------------------------

    def call_primal(self, cvals2d, args, B: BShape) -> jax.Array:
        """Primal half; returns the packed (n_boundary_f32, *B) tensor."""
        bt = _bt(B)
        lit_vals, pre = self._cvals(cvals2d)
        outs = lane_eval(
            self.primal_view, [], args, [True] * len(args), B,
            literal_vals=lit_vals, pre_env=pre,
        )
        parts = []
        for val, (shp, dt, n) in zip(outs, self.bound_meta):
            if dt == jnp.bool_:
                val = jnp.where(val, jnp.float32(1.0), jnp.float32(0.0))
            elif val.dtype != jnp.float32:
                val = val.astype(jnp.float32)
            parts.append(jax.lax.reshape(val, (n,) + bt))
        return jax.lax.concatenate(parts, 0)

    def unpack_boundary(self, packed: jax.Array, B: BShape) -> List[jax.Array]:
        bt = _bt(B)
        vals, off = [], 0
        for shp, dt, n in self.bound_meta:
            sl = jax.lax.slice_in_dim(packed, off, off + n, axis=0)
            val = jax.lax.reshape(sl, tuple(shp) + bt)
            if dt == jnp.bool_:
                val = val != 0
            elif dt != jnp.float32:
                val = val.astype(dt)
            vals.append(val)
            off += n
        return vals

    def call_tangent(self, cvals2d, packed: jax.Array, targs, B: BShape):
        """Tangent half. `targs`: the tangent inputs (dx, du, ...), each an
        UNBATCHED traced vector (the basis direction of this grid step,
        shared across the block's lanes)."""
        lit_vals, pre = self._cvals(cvals2d)
        bvals = self.unpack_boundary(packed, B)
        args = list(bvals) + list(targs)
        args_b = [True] * len(bvals) + [False] * len(targs)
        return lane_eval(
            self.tangent_view, [], args, args_b, B,
            literal_vals=lit_vals, pre_env=pre,
        )

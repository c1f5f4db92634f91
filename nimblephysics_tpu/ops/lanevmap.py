"""Batch-last jaxpr evaluation for Pallas TPU kernels ("lane vmap").

TPU vector registers are (8 sublanes, 128 lanes). A batch of small physics
states shaped (B, 4) laid out batch-first uses 4 of 128 lanes — the
measured reason the iLQR linearization sweep ran ~30x off speed-of-light.
`jax.vmap` can't fix this inside a Pallas kernel: its batching rules move
the batch dim wherever convenient (often axis 0), producing batched
matmuls Mosaic refuses ("batch dims must be equal").

`lane_eval` instead interprets the UNBATCHED jaxpr of a function (traced
once at per-world shapes, e.g. the 565-op cartpole step) with every value
carrying the world batch as TRAILING axes. Each primitive is re-emitted
with the batch dims pinned last:

  * elementwise ops bind unchanged (operands share the same batched shape),
  * shape ops (broadcast/reshape/transpose/slice/concat/...) get their
    dim parameters remapped around the trailing axes,
  * `dot_general` on tiny physics matrices is lowered to an UNROLLED
    slice-multiply-accumulate over the contraction index set — pure VPU
    work; there is nothing for the MXU in a 6x6 spatial-algebra product,
    the parallelism is all in the batch.

The batch tail is a TUPLE of axes, normally (block//128, 128): the batch
occupies BOTH the sublane and the lane dimension of every vector register,
so the tiny physics dims only ever live in leading vreg-array positions
and every value carries the natural (8,128)-tiled layout. This is the
load-bearing design decision: with a single trailing lane axis, small
dims land on sublanes and Mosaic's layout inference produces
implicit/replicated layouts that downstream ops cannot relayout
("Invalid relayout: Non-singleton logical dimension is replicated...",
"Not implemented: Layout with implicit dimension" — the round-2/3
half-cheetah failures, bisected to a second-minor reduce in a (3,3)@(3,)
matvec and to 4-D leading-dim transposes).

Used by `ops/pallas_linearize.py` / `ops/pallas_rollout.py` (reference
analogue: the per-step Jacobians the gradient engine assembles in
`dart/neural/BackpropSnapshot.cpp:980`, there computed by hand per joint
type; here any traced step function works).

Restrictions: the jaxpr must be control-flow free (scan/while/cond) and
gather/scatter free — true for the framework's trace-unrolled dynamics
(ops/dynamics.py builds qdd/tau by concatenation for exactly this reason).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import core as jcore

try:  # jax >= 0.4.x moved Literal around; support both
    from jax._src.core import Literal
except Exception:  # pragma: no cover
    from jax.core import Literal  # type: ignore


# Primitives whose operands all share one shape in a canonical jaxpr:
# rebinding with batched operands of equal shape is valid as-is.
_ELEMENTWISE = {
    "add", "sub", "mul", "div", "rem", "pow", "atan2", "max", "min",
    "neg", "sign", "floor", "ceil", "round", "abs", "sqrt", "rsqrt",
    "cbrt", "exp", "exp2", "expm1", "log", "log1p", "tanh", "sin", "cos",
    "tan", "asin", "acos", "atan", "sinh", "cosh", "asinh", "acosh",
    "atanh", "logistic", "erf", "erfc", "erf_inv", "integer_pow",
    "not", "and", "or", "xor", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "eq", "ne", "lt", "le", "gt", "ge",
    "add_any", "select_n", "clamp", "nextafter", "is_finite", "square",
    "copy", "population_count", "clz", "imag", "real",
}

# Unary ops carrying only dtype-like params (bind as-is on batched input).
_DTYPE_OPS = {"convert_element_type", "bitcast_convert_type", "reduce_precision"}

_REDUCE_OPS = {"reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
               "reduce_and", "reduce_or", "argmax", "argmin"}

BShape = Union[int, Tuple[int, ...]]


def _bt(B: BShape) -> Tuple[int, ...]:
    """Normalize the batch tail: int -> one trailing axis, tuple as-is."""
    return (B,) if isinstance(B, int) else tuple(B)


def _lit_key(val: np.ndarray) -> Tuple:
    return (val.shape, str(val.dtype), val.tobytes())


def collect_array_literals(jaxpr: jcore.Jaxpr) -> List[np.ndarray]:
    """Unique non-scalar Literal arrays in a jaxpr (recursing into call
    sub-jaxprs). Pallas kernels cannot close over array constants — the
    caller passes these as kernel inputs and hands them back to
    `lane_eval` via `literal_vals` keyed by `_lit_key`."""
    seen = {}
    order: List[np.ndarray] = []

    def add(val):
        val = np.asarray(val)
        if val.ndim >= 1:
            key = _lit_key(val)
            if key not in seen:
                seen[key] = True
                order.append(val)

    def visit_param(p):
        if hasattr(p, "consts") and hasattr(p, "jaxpr"):
            for c in p.consts:  # inner-closed-jaxpr constants
                add(c)
            walk(p.jaxpr)
        elif hasattr(p, "eqns"):
            walk(p)
        elif isinstance(p, (tuple, list)):
            for sub in p:
                visit_param(sub)

    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.invars:
                if isinstance(v, Literal):
                    add(v.val)
            for p in eqn.params.values():
                visit_param(p)

    walk(jaxpr)
    return order


def hoist_unbatched(
    jaxpr: jcore.Jaxpr,
    consts: Sequence[Any],
    args_batched: Sequence[bool],
) -> Tuple[List[Any], List[Any]]:
    """Partially evaluate the const-only subgraph of `jaxpr` OUTSIDE a
    kernel. Everything that depends only on the jaxpr's constants (model
    parameters) is computed natively here; returns (boundary_vars,
    boundary_vals) — the unbatched values that batched equations consume.
    Pass them into the kernel and hand them to `lane_eval(pre_env=...)`,
    which then skips every unbatched equation (Mosaic cannot lower many
    tiny-rank const manipulations, and they'd be recomputed per grid step)."""
    env: Dict[Any, Any] = {}
    batched = set()
    for cv, c in zip(jaxpr.constvars, consts):
        env[cv] = c
    for av, b in zip(jaxpr.invars, args_batched):
        if not b:
            raise NotImplementedError("hoist_unbatched: unbatched args")
        batched.add(av)

    boundary: List[Any] = []
    seen = set()
    for eqn in jaxpr.eqns:
        ins_b = [v in batched for v in eqn.invars if not isinstance(v, Literal)]
        if not any(ins_b):
            vals = [v.val if isinstance(v, Literal) else env[v]
                    for v in eqn.invars]
            out = eqn.primitive.bind(*vals, **eqn.params)
            outs = out if eqn.primitive.multiple_results else [out]
            for ov, o in zip(eqn.outvars, outs):
                env[ov] = o
        else:
            for ov in eqn.outvars:
                batched.add(ov)
            for v in eqn.invars:
                if (not isinstance(v, Literal) and v not in batched
                        and v not in seen):
                    seen.add(v)
                    boundary.append(v)
    for ov in jaxpr.outvars:
        if not isinstance(ov, Literal) and ov not in batched and ov not in seen:
            seen.add(ov)
            boundary.append(ov)
    return boundary, [env[v] for v in boundary]


def count_eqns(jaxpr) -> int:
    """Total equations including call sub-jaxprs — a proxy for the live
    lane-value set a kernel holds in VMEM."""
    n = len(jaxpr.eqns)
    for eqn in jaxpr.eqns:
        for p in eqn.params.values():
            sub = getattr(p, "jaxpr", None)
            if sub is not None and hasattr(sub, "eqns"):
                n += count_eqns(sub)
            elif hasattr(p, "eqns"):
                n += count_eqns(p)
    return n


def lane_flops(closed) -> int:
    """Σ output elements over all equations (recursing into call
    sub-jaxprs) of an UNBATCHED lane trace — ≈ VPU flops per lane per
    kernel evaluation (each emitted op produces ~1 flop per output element
    per lane). Used by bench.py's utilization accounting; an ESTIMATE, not
    a hardware counter."""
    def walk(jx) -> int:
        n = 0
        for eqn in jx.eqns:
            has_sub = False
            for p in eqn.params.values():
                sub = getattr(p, "jaxpr", None)
                if sub is not None and hasattr(sub, "eqns"):
                    n += walk(sub)
                    has_sub = True
                elif hasattr(p, "eqns"):
                    n += walk(p)
                    has_sub = True
            if has_sub:
                # call-style eqn: the sub-jaxpr walk already counted the
                # eqns producing these outputs — counting the call's own
                # outvars too would double-count (advisor r3)
                continue
            for ov in eqn.outvars:
                if hasattr(ov, "aval"):
                    n += max(1, int(np.prod(ov.aval.shape)))
        return n

    return walk(closed.jaxpr)


def fit_block(block_b: int, n_eqns: int, budget: int = 1_300_000) -> int:
    """Shrink the batch-block size for large traced graphs so the kernel's
    live values stay inside the ~16MB scoped-VMEM budget (empirical: the
    ~1.1k-eqn cartpole step JVP fits at 1024 lanes). Never below 128 (one
    full lane row)."""
    while block_b > 128 and n_eqns * block_b > budget:
        block_b //= 2
    return block_b


class LaneFn:
    """A function traced once at per-world shapes, prepared for lane-batched
    evaluation inside a Pallas kernel.

    Host side: `consts2d` are the values to pass as (unbatched) kernel
    inputs — the hoisted const-graph boundary plus any array literals, each
    reshaped 2-D (`to2d`). Kernel side: `call(cvals, args, B)` evaluates
    the function with every arg carrying trailing batch axes `B` (an int
    for a single trailing axis, or a tuple like (block//128, 128) for the
    sublane+lane tail the TPU kernels use), where `cvals` are the
    kernel-ref reads of `consts2d` in order."""

    def __init__(self, fn, example_args):
        self.closed = jax.make_jaxpr(fn)(*example_args)
        n_args = len(jax.tree_util.tree_leaves(example_args))
        bvars, bvals = hoist_unbatched(
            self.closed.jaxpr, self.closed.consts, [True] * n_args
        )
        self.empty = [(v, jnp.asarray(b)) for v, b in zip(bvars, bvals)
                      if jnp.asarray(b).size == 0]
        kept = [(v, jnp.asarray(b)) for v, b in zip(bvars, bvals)
                if jnp.asarray(b).size != 0]
        self.bvars = [v for v, _ in kept]
        self.literals = collect_array_literals(self.closed.jaxpr)
        consts = [b for _, b in kept] + [jnp.asarray(l) for l in self.literals]
        self.meta = [(c.shape, c.dtype) for c in consts]
        self.consts2d = [self.to2d(c) for c in consts]
        self.n_boundary = len(kept)

    @staticmethod
    def to2d(a):
        a = jnp.asarray(a)
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.int32)
        if a.ndim == 0:
            return a.reshape(1, 1)
        if a.ndim == 1:
            return a.reshape(1, -1)
        return a.reshape(-1, a.shape[-1])

    @property
    def n_consts(self) -> int:
        return len(self.consts2d)

    def call(self, cvals2d, args, B: BShape):
        """Evaluate inside a kernel. cvals2d: reads of the const refs
        (2-D); args: batch-tailed values (..., *B)."""
        cvals = []
        for c, (shape, dt) in zip(cvals2d, self.meta):
            v = c.reshape(shape)
            if v.dtype != dt:
                v = v.astype(dt)
            cvals.append(v)
        lit_vals = {
            _lit_key(np.asarray(l)): v
            for l, v in zip(self.literals, cvals[self.n_boundary:])
        }
        pre = dict(zip(self.bvars, cvals[:self.n_boundary]))
        for v, e in self.empty:
            # concrete numpy empty: zero-size values must never enter the
            # kernel trace (Mosaic has no 0-size vectors); consumers drop
            # them (see lane_eval's zero-size guard)
            pre[v] = np.zeros(e.shape, e.dtype)
        return lane_eval(
            self.closed.jaxpr, [], args, [True] * len(args), B,
            literal_vals=lit_vals, pre_env=pre,
        )


def _remap_consts(consts, literal_vals):
    """Swap inner-jaxpr closure constants for their kernel-input values."""
    if not literal_vals:
        return consts
    out = []
    for c in consts:
        if hasattr(c, "shape") and getattr(c, "ndim", 0) >= 1:
            out.append(literal_vals.get(_lit_key(np.asarray(c)), c))
        else:
            out.append(c)
    return out


def _bcast(val: jax.Array, batched: bool, bt: Tuple[int, ...]) -> jax.Array:
    """Materialize an unbatched value to shape val.shape + bt.

    Concrete (non-tracer) values lower via per-element `lax.full`
    immediates — any array-shaped concrete intermediate would be captured
    as a constant, which pallas_call forbids. These only arise from tiny
    const leftovers inside call sub-jaxprs (the main const graph is hoisted
    out by `hoist_unbatched`), so the element count is small."""
    if batched:
        return val
    nbt = len(bt)
    if not isinstance(val, jcore.Tracer):
        a = np.asarray(val)
        if a.ndim == 0:
            return jax.lax.full(bt, a.item(), a.dtype)
        rows = [jax.lax.full(bt, x.item(), a.dtype) for x in a.ravel()]
        return jnp.stack(rows).reshape(a.shape + bt)
    if val.dtype == jnp.bool_:
        # Mosaic can't insert a minor dim on i1 vectors ("Insertion of
        # minor dim that is not a no-op only supported for 32-bit
        # types"); broadcast through i32 and compare back.
        iv = jax.lax.convert_element_type(val, jnp.int32)
        return _bcast(iv, False, bt) != 0
    if nbt == 1:
        return jnp.broadcast_to(val[..., None], val.shape + bt)
    # nbt == 2: Mosaic rejects direct rank+2 broadcasts of tiny traced
    # vectors ("infer-vector-layout: unsupported shape cast"); broadcast
    # onto lanes first (the proven rank+1 form), then materialize the
    # sublane batch axis by concatenation.
    vl = jnp.broadcast_to(val[..., None], val.shape + bt[-1:])
    vl = jax.lax.expand_dims(vl, (val.ndim,))
    if bt[0] == 1:
        return vl
    return jax.lax.concatenate([vl] * bt[0], val.ndim)


def _lane_transpose(x: jax.Array, perm: Sequence[int], nbt: int) -> jax.Array:
    """Permutation of the LEADING dims of a batch-tailed value (trailing
    `nbt` batch axes fixed). Non-trivial permutations with >2 leading dims
    are unrolled into slice/concat (Mosaic rejected >=4-D transposes with
    implicit-dim layouts in round 2; with the sublane+lane tail native
    leading transposes compile, but the unroll is kept as correctness-
    neutral insurance for deep ranks)."""
    perm = tuple(perm)
    rank = x.ndim
    assert perm[-nbt:] == tuple(range(rank - nbt, rank)), \
        "batch tail must stay last"
    if perm == tuple(range(rank)):
        return x
    if rank <= 2 + nbt:
        return jax.lax.transpose(x, perm)
    d = perm[0]  # source dim that becomes output dim 0
    sub = [p - (p > d) for p in perm[1:]]
    parts = []
    for i in range(x.shape[d]):
        sl = jax.lax.index_in_dim(x, i, axis=d, keepdims=False)
        parts.append(jax.lax.expand_dims(_lane_transpose(sl, sub, nbt), (0,)))
    return parts[0] if len(parts) == 1 else jax.lax.concatenate(parts, 0)


def _dot_general_unrolled(lhs, rhs, lc, rc, bt: Tuple[int, ...]):
    """Transpose- and reduce-free dot_general (no batch dims): unroll the
    (tiny) contraction index set; each term is slice + broadcast_in_dim
    with strictly increasing dims + multiply-accumulate — all layout-safe
    in Mosaic (no second-minor reduction, no mid-kernel transpose; see the
    module docstring for the two failure modes this avoids). Same FLOPs as
    materialize-and-reduce, lower peak VMEM."""
    nbt = len(bt)
    lfree = [d for d in range(lhs.ndim - nbt) if d not in lc]
    rfree = [d for d in range(rhs.ndim - nbt) if d not in rc]
    lfs = tuple(lhs.shape[d] for d in lfree)
    rfs = tuple(rhs.shape[d] for d in rfree)
    nlf, nrf = len(lfs), len(rfs)
    full = lfs + rfs + bt
    rank = len(full)
    l_dims = tuple(range(nlf)) + tuple(range(rank - nbt, rank))
    r_dims = tuple(range(nlf, nlf + nrf)) + tuple(range(rank - nbt, rank))
    csizes = [lhs.shape[d] for d in lc]
    out = None
    for idx in itertools.product(*[range(s) for s in csizes]):
        ls, rs = lhs, rhs
        for d, i in sorted(zip(lc, idx), reverse=True):
            ls = jax.lax.index_in_dim(ls, i, axis=d, keepdims=False)
        for d, i in sorted(zip(rc, idx), reverse=True):
            rs = jax.lax.index_in_dim(rs, i, axis=d, keepdims=False)
        term = jax.lax.broadcast_in_dim(ls, full, l_dims) * \
            jax.lax.broadcast_in_dim(rs, full, r_dims)
        out = term if out is None else out + term
    return out


def _dot_general_reduce_chunked(lhs, rhs, lc, rc, bt, cchunk):
    """Materialize-and-reduce contraction (single contraction dim, no
    dot-batch dims): operands transposed to (free..., c), broadcast to
    (lfree..., rfree..., c, bt), multiplied, and reduce_sum'd over the
    contraction axis — which is a LEADING (vreg-array) dim relative to
    the sublane+lane batch tail, the layout-safe reduction direction
    (see _REDUCE_OPS). The contraction is walked in chunks of `cchunk`
    so the materialized product stays VMEM-bounded.

    vs `_dot_general_unrolled`: same FLOPs, but csize/cchunk big ops
    instead of csize serial multiply-adds — for the large (m ~ 100)
    matvecs of humanoid-class contact solves this cuts the emitted
    equation count ~100x (the Mosaic compile envelope is equation-
    bound) and sidesteps the serial-FMA instruction-latency chain that
    measured ~4.7 cycles/instr on the bench kernels."""
    nbt = len(bt)
    (cd,) = lc
    (rcd,) = rc
    csize = lhs.shape[cd]
    lfree = [d for d in range(lhs.ndim - nbt) if d != cd]
    rfree = [d for d in range(rhs.ndim - nbt) if d != rcd]
    l_perm = lfree + [cd] + list(range(lhs.ndim - nbt, lhs.ndim))
    r_perm = rfree + [rcd] + list(range(rhs.ndim - nbt, rhs.ndim))
    lt = _lane_transpose(lhs, l_perm, nbt)
    rt = _lane_transpose(rhs, r_perm, nbt)
    nlf, nrf = len(lfree), len(rfree)
    lfs = lt.shape[:nlf]
    rfs = rt.shape[:nrf]
    out = None
    for off in range(0, csize, cchunk):
        n = min(cchunk, csize - off)
        ls = jax.lax.slice_in_dim(lt, off, off + n, axis=nlf)
        rs = jax.lax.slice_in_dim(rt, off, off + n, axis=nrf)
        full = lfs + rfs + (n,) + bt
        rank = len(full)
        l_dims = tuple(range(nlf)) + tuple(range(nlf + nrf, rank))
        r_dims = tuple(range(nlf, rank))
        prod = jax.lax.broadcast_in_dim(ls, full, l_dims) * \
            jax.lax.broadcast_in_dim(rs, full, r_dims)
        term = jnp.sum(prod, axis=nlf + nrf)
        out = term if out is None else out + term
    return out


# Contraction lowering policy: contractions with index-set size below
# _REDUCE_MIN_C use the unrolled slice-FMA form (proven on every bench
# model; tiny matvecs are latency-comparable and the materialized form
# has per-op overhead). At or above it, single-dim contractions use the
# chunked materialize-and-reduce form, with the transient product capped
# at _REDUCE_MAT_CAP values per lane (VMEM bound; chunking the
# contraction keeps big matvecs on the reduce path while matrix-matrix
# products whose free set is already large fall back to the unroll).
import os as _os

# MEASURED NEGATIVE (round-5 Atlas bisect): the materialize-and-reduce
# form at m = 102 (a (102,102,S_b,128) transient reduced over a middle
# dim) crashes the remote Mosaic compile helper (HTTP 500) — the SAME
# isolated kernel compiles with the unrolled slice-FMA form. Disabled by
# default; the env knob remains for future Mosaic versions. (The unroll
# also keeps eqn counts honest for the chain splitter, which simply cuts
# more chunks.)
_REDUCE_MIN_C = int(_os.environ.get("NTPU_DOT_REDUCE_MIN", "100000"))
_REDUCE_MAT_CAP = int(_os.environ.get("NTPU_DOT_REDUCE_CAP", "16384"))


def _dot_general_lanes(lhs, rhs, dimension_numbers, B: BShape):
    """dot_general with both operands batched on trailing batch axes,
    lowered for the VPU (the contracted dims are tiny physics dims, the
    FLOPs live in the batch axes)."""
    bt = _bt(B)
    nbt = len(bt)
    (lc, rc), (lb, rb) = dimension_numbers
    lhs_rank = lhs.ndim - nbt
    rhs_rank = rhs.ndim - nbt
    lfree = [d for d in range(lhs_rank) if d not in lc and d not in lb]
    rfree = [d for d in range(rhs_rank) if d not in rc and d not in rb]
    if lc and not lb:
        csize = int(np.prod([lhs.shape[d] for d in lc]))
        out_free = int(np.prod([lhs.shape[d] for d in lfree], dtype=np.int64)
                       * np.prod([rhs.shape[d] for d in rfree],
                                 dtype=np.int64))
        if (len(lc) == 1 and nbt >= 2 and csize >= _REDUCE_MIN_C):
            cchunk = min(csize, max(1, _REDUCE_MAT_CAP // max(out_free, 1)))
            if cchunk >= 8:
                return _dot_general_reduce_chunked(lhs, rhs, lc, rc, bt,
                                                   cchunk)
        # small/irregular contractions: unrolled slice-FMA form
        return _dot_general_unrolled(lhs, rhs, lc, rc, bt)
    # outer products (nc==0) or dot-batch dims: materialize form.
    # out layout: batch..., lfree..., rfree..., bt
    l_perm = list(lb) + lfree + list(lc) + \
        list(range(lhs_rank, lhs_rank + nbt))
    r_perm = list(rb) + rfree + list(rc) + \
        list(range(rhs_rank, rhs_rank + nbt))
    lt = _lane_transpose(lhs, l_perm, nbt)
    rt = _lane_transpose(rhs, r_perm, nbt)
    nb, nlf, nrf, nc = len(lb), len(lfree), len(rfree), len(lc)
    bsh = lt.shape[:nb]
    lfs = lt.shape[nb: nb + nlf]
    csh = lt.shape[nb + nlf: nb + nlf + nc]
    rfs = rt.shape[nb: nb + nrf]
    full = bsh + lfs + rfs + csh + bt
    rank = len(full)
    l_dims = tuple(range(nb + nlf)) + tuple(range(nb + nlf + nrf, rank))
    r_dims = tuple(range(nb)) + tuple(range(nb + nlf, rank))
    lt = jax.lax.broadcast_in_dim(lt, full, l_dims)
    rt = jax.lax.broadcast_in_dim(rt, full, r_dims)
    prod = lt * rt  # (b..., lf..., rf..., c..., bt)
    axes = tuple(range(nb + nlf + nrf, nb + nlf + nrf + nc))
    return jnp.sum(prod, axis=axes) if axes else prod


def lane_eval(
    jaxpr: jcore.Jaxpr,
    consts: Sequence[Any],
    args: Sequence[Any],
    args_batched: Sequence[bool],
    B: BShape,
    literal_vals: Dict[Tuple, jax.Array] = None,
    pre_env: Dict[Any, jax.Array] = None,
) -> List[jax.Array]:
    """Evaluate `jaxpr` with selected args carrying trailing batch axes
    `B` (int or tuple; the TPU kernels pass (block//128, 128)). Returns
    outputs, each batched (broadcast if the corresponding output turned
    out constant across the batch).

    `literal_vals` maps `_lit_key` of non-scalar jaxpr Literals to values
    already inside the kernel (see `collect_array_literals`). `pre_env`
    maps jaxpr vars to precomputed unbatched values (`hoist_unbatched`);
    when given, equations not needed for the outputs are skipped."""
    bt = _bt(B)
    nbt = len(bt)
    bdims_of = lambda r: tuple(range(r, r + nbt))  # noqa: E731
    env: Dict[Any, Any] = {}
    is_b: Dict[Any, bool] = {}

    def read(v):
        if isinstance(v, Literal):
            val = np.asarray(v.val)
            if val.ndim >= 1 and literal_vals is not None:
                return literal_vals[_lit_key(val)], False
            return v.val, False
        return env[v], is_b[v]

    def write(v, val, b):
        env[v] = val
        is_b[v] = b

    for cv, c in zip(jaxpr.constvars, consts):
        write(cv, c, False)
    for av, a, b in zip(jaxpr.invars, args, args_batched):
        write(av, a, bool(b))
    if pre_env:
        for v, val in pre_env.items():
            write(v, val, False)

    if pre_env is not None:
        # liveness filter: only equations needed for the outputs, given
        # that pre_env already provides the unbatched boundary values.
        live = {v for v in jaxpr.outvars
                if not isinstance(v, Literal) and v not in env}
        needed = []
        for eqn in reversed(jaxpr.eqns):
            if any(ov in live for ov in eqn.outvars):
                needed.append(eqn)
                # proper backward liveness: once the producer is found,
                # its outputs are resolved — an EARLIER duplicate of the
                # same equation (chain-boundary remat can create them)
                # must not be kept too
                for ov in eqn.outvars:
                    live.discard(ov)
                for v in eqn.invars:
                    if not isinstance(v, Literal) and v not in env:
                        live.add(v)
        needed.reverse()
        eqns = needed
    else:
        eqns = jaxpr.eqns

    for eqn in eqns:
        prim = eqn.primitive.name

        # Zero-size values cannot exist inside Mosaic kernels (e.g. the
        # dof slice of a weld joint). Keep them as concrete numpy empties
        # on the unbatched side; `concatenate` below drops them.
        if eqn.outvars and all(
            hasattr(ov, "aval") and int(np.prod(ov.aval.shape)) == 0
            for ov in eqn.outvars
        ):
            for ov in eqn.outvars:
                write(ov, np.zeros(ov.aval.shape, ov.aval.dtype), False)
            continue

        ins = [read(v) for v in eqn.invars]
        vals = [v for v, _ in ins]
        bs = [b for _, b in ins]
        any_b = any(bs)

        if not any_b:
            # Fully CONCRETE subgraph (const leftovers inside call
            # sub-jaxprs): evaluate eagerly OUTSIDE the ambient trace —
            # binding under the kernel trace would record the op with its
            # concrete inputs as captured constants, which pallas forbids.
            if all(not isinstance(v, jcore.Tracer) for v in vals):
                with jax.ensure_compile_time_eval():
                    out = eqn.primitive.bind(*vals, **eqn.params)
                outs = out if eqn.primitive.multiple_results else [out]
                for ov, o in zip(eqn.outvars, outs):
                    write(ov, np.asarray(o), False)
                continue
            # Unbatched but TRACED (boundary-value) subgraph: stays in the
            # kernel; dot_general must be decomposed — Mosaic's
            # small-vector multi_reduction path is unsupported (dummy
            # single-lane axis).
            if prim == "dot_general":
                oav = eqn.outvars[0].aval
                if any(int(np.prod(np.shape(v))) == 0 for v in vals):
                    # contraction over an empty dim: exact zeros
                    out = np.zeros(oav.shape, oav.dtype)
                else:
                    out = _dot_general_lanes(
                        vals[0][..., None], vals[1][..., None],
                        eqn.params["dimension_numbers"], 1,
                    )[..., 0]
                    pd = eqn.params.get("preferred_element_type")
                    if pd is not None and out.dtype != pd:
                        out = out.astype(pd)
                write(eqn.outvars[0], out, False)
                continue
            out = eqn.primitive.bind(*vals, **eqn.params)
            outs = out if eqn.primitive.multiple_results else [out]
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, False)
            continue

        if prim in _ELEMENTWISE or prim in _DTYPE_OPS:
            # scalar literals may appear rank-mismatched in the jaxpr;
            # broadcast everything to the common unbatched shape first
            ushapes = [v.shape[:-nbt] if b else np.shape(v) for v, b in ins]
            tgt = np.broadcast_shapes(*ushapes) if ins else ()
            vb = []
            for (v, b), us in zip(ins, ushapes):
                if us != tgt:
                    if b:
                        osh = tgt + v.shape[-nbt:]
                        v = jax.lax.broadcast_in_dim(
                            v, osh,
                            tuple(range(len(osh) - v.ndim, len(osh))),
                        )
                    elif not isinstance(v, jcore.Tracer) and np.ndim(v) == 0:
                        a = np.asarray(v)
                        vb.append(jax.lax.full(tgt + bt, a.item(), a.dtype))
                        continue
                    else:
                        v = jnp.broadcast_to(v, tgt)
                vb.append(_bcast(v, b, bt))
            out = eqn.primitive.bind(*vb, **eqn.params)
            outs = out if eqn.primitive.multiple_results else [out]
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, True)

        elif prim == "broadcast_in_dim":
            shape = tuple(eqn.params["shape"])
            bdims = tuple(eqn.params["broadcast_dimensions"])
            out = jax.lax.broadcast_in_dim(
                vals[0], shape + bt, bdims + bdims_of(len(shape))
            )
            write(eqn.outvars[0], out, True)

        elif prim == "reshape":
            new_sizes = tuple(eqn.params["new_sizes"])
            out = jax.lax.reshape(vals[0], new_sizes + bt)
            write(eqn.outvars[0], out, True)

        elif prim == "transpose":
            perm = tuple(eqn.params["permutation"])
            out = _lane_transpose(
                vals[0], perm + bdims_of(len(perm)), nbt
            )
            write(eqn.outvars[0], out, True)

        elif prim == "squeeze":
            out = jax.lax.squeeze(vals[0], eqn.params["dimensions"])
            write(eqn.outvars[0], out, True)

        elif prim == "expand_dims":
            out = jax.lax.expand_dims(vals[0], eqn.params["dimensions"])
            write(eqn.outvars[0], out, True)

        elif prim == "slice":
            p = eqn.params
            starts = tuple(p["start_indices"]) + (0,) * nbt
            limits = tuple(p["limit_indices"]) + bt
            strides = p["strides"]
            strides = (tuple(strides) + (1,) * nbt) if strides is not None \
                else None
            out = jax.lax.slice(vals[0], starts, limits, strides)
            write(eqn.outvars[0], out, True)

        elif prim == "rev":
            out = jax.lax.rev(vals[0], eqn.params["dimensions"])
            write(eqn.outvars[0], out, True)

        elif prim == "pad":
            # reverse-mode AD transposes `slice` into `pad` — extend the
            # config with no-op padding on the trailing batch axes
            cfg = tuple(eqn.params["padding_config"]) + ((0, 0, 0),) * nbt
            pv = vals[1]
            if not isinstance(pv, jcore.Tracer):
                pv = jnp.asarray(np.asarray(pv).item(),
                                 dtype=vals[0].dtype)
            out = jax.lax.pad(_bcast(vals[0], bs[0], bt), pv, cfg)
            write(eqn.outvars[0], out, True)

        elif prim == "concatenate":
            vb = [_bcast(v, b, bt) for v, b in ins
                  if int(np.prod(np.shape(v))) > 0]
            out = jax.lax.concatenate(vb, eqn.params["dimension"])
            write(eqn.outvars[0], out, True)

        elif prim == "split":
            # emit as slices: lax.split with a ZERO-SIZE piece creates a
            # 0-size vector type Mosaic rejects ("MLIRError: Invalid
            # type" — hit by the VJP kernel on limits-only models where
            # a cotangent split has an empty contact segment); zero-size
            # pieces become concrete numpy empties like everywhere else
            axis = eqn.params["axis"]
            off = 0
            for ov, sz in zip(eqn.outvars, eqn.params["sizes"]):
                if int(np.prod(ov.aval.shape)) == 0:
                    write(ov, np.zeros(ov.aval.shape, ov.aval.dtype), False)
                else:
                    write(ov, jax.lax.slice_in_dim(
                        vals[0], off, off + sz, axis=axis), True)
                off += sz

        elif prim in _REDUCE_OPS:
            # reduce axes address only LEADING (vreg-array) dims — with the
            # sublane+lane batch tail these reductions are layout-safe.
            axes = tuple(eqn.params["axes"])
            p = {k: v for k, v in eqn.params.items() if k not in ("axes",)}
            out = eqn.primitive.bind(_bcast(vals[0], bs[0], bt),
                                     axes=axes, **p)
            write(eqn.outvars[0], out, True)

        elif prim == "dot_general":
            oav = eqn.outvars[0].aval
            if any(int(np.prod(np.shape(v))) == 0 for v in vals):
                # contraction over an empty dim: exact zeros (lax.full is
                # an immediate; a zeros CONSTANT would be captured)
                out = jax.lax.full(tuple(oav.shape) + bt, 0.0, oav.dtype)
                write(eqn.outvars[0], out, True)
            else:
                lhs = _bcast(vals[0], bs[0], bt)
                rhs = _bcast(vals[1], bs[1], bt)
                out = _dot_general_lanes(
                    lhs, rhs, eqn.params["dimension_numbers"], bt
                )
                pd = eqn.params.get("preferred_element_type")
                if pd is not None and out.dtype != pd:
                    out = out.astype(pd)
                write(eqn.outvars[0], out, True)

        elif prim == "dynamic_slice":
            # operand batched, indices static/unbatched scalars
            op = vals[0]
            idx = vals[1:]
            if any(bs[1:]):
                raise NotImplementedError("lane_eval: batched dynamic_slice index")
            sizes = tuple(eqn.params["slice_sizes"]) + bt
            zero = jnp.zeros((), dtype=idx[0].dtype) if idx else jnp.zeros((), jnp.int32)
            out = jax.lax.dynamic_slice(
                _bcast(op, bs[0], bt), tuple(idx) + (zero,) * nbt, sizes
            )
            write(eqn.outvars[0], out, True)

        elif prim == "dynamic_update_slice":
            op, upd = vals[0], vals[1]
            idx = vals[2:]
            if any(bs[2:]):
                raise NotImplementedError("lane_eval: batched dynamic_update_slice index")
            zero = jnp.zeros((), dtype=idx[0].dtype) if idx else jnp.zeros((), jnp.int32)
            out = jax.lax.dynamic_update_slice(
                _bcast(op, bs[0], bt), _bcast(upd, bs[1], bt),
                tuple(idx) + (zero,) * nbt
            )
            write(eqn.outvars[0], out, True)

        elif prim in ("jit", "pjit", "closed_call", "core_call", "xla_call"):
            sub = eqn.params["jaxpr"]
            sub_jaxpr = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            sub_consts = _remap_consts(
                sub.consts if hasattr(sub, "consts") else [], literal_vals
            )
            outs = lane_eval(sub_jaxpr, sub_consts, vals, bs, bt, literal_vals)
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, True)

        elif prim in ("custom_jvp_call", "custom_vjp_call",
                      "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr"):
            sub = eqn.params.get("call_jaxpr") or eqn.params.get("fun_jaxpr")
            sub_jaxpr = sub.jaxpr if hasattr(sub, "jaxpr") else sub
            sub_consts = _remap_consts(
                sub.consts if hasattr(sub, "consts") else [], literal_vals
            )
            outs = lane_eval(sub_jaxpr, sub_consts, vals, bs, bt, literal_vals)
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, True)

        elif prim == "custom_linear_solve":
            # Forward semantics: run the `solve` sub-jaxpr on (its consts,
            # b). The matvec/vecmat/transpose sub-jaxprs only matter for
            # AD rules, which JAX has already applied by the time this
            # jaxpr exists (a JVP trace contains TWO custom_linear_solve
            # eqns — primal and implicit-tangent — each forward-evaluated
            # here; see ops/frozen_contact.solve_frozen).
            cl = eqn.params["const_lengths"]
            js = eqn.params["jaxprs"]
            ofs = cl.matvec + cl.vecmat
            sol = ins[ofs: ofs + cl.solve]
            ofs += cl.solve + cl.transpose_solve
            bins = ins[ofs:]
            sub = js.solve
            sub_consts = _remap_consts(sub.consts, literal_vals)
            pairs = sol + bins
            outs = lane_eval(
                sub.jaxpr, sub_consts,
                [v for v, _ in pairs], [b for _, b in pairs],
                bt, literal_vals,
            )
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, True)

        elif prim == "optimization_barrier":
            outs = jax.lax.optimization_barrier(
                tuple(_bcast(v, b_, bt) for v, b_ in ins)
            )
            for ov, o in zip(eqn.outvars, outs):
                write(ov, o, True)

        elif prim == "stop_gradient":
            write(eqn.outvars[0], vals[0], bs[0])

        else:
            raise NotImplementedError(
                f"lane_eval: primitive '{prim}' not supported (shape-unrolled "
                f"dynamics should not contain it); eqn: {eqn}"
            )

    outs = []
    for ov in jaxpr.outvars:
        v, b = read(ov)
        outs.append(_bcast(v, b, bt))
    return outs

"""Batched boxed LCP solver with analytic active-set gradients.

Solves the contact/limit impulse problem in the reference's boxed-LCP form
(`BoxedLcpConstraintSolver.cpp:352-365`): find x with

    w = A x - b,   lo_i(x) <= x_i <= hi_i(x),
    x_i = lo_i  =>  w_i >= 0
    x_i = hi_i  =>  w_i <= 0
    lo_i < x_i < hi_i  =>  w_i = 0

where friction rows have bounds proportional to their governing normal
impulse: lo/hi_i = ∓ fscale_i * x[findex_i] (ODE's findex convention).
`findex` is part of the STATIC contact-slot topology, so it is a Python
tuple (-1 for uncoupled rows) and all coupling indexing happens at trace
time.

Forward: projected Gauss-Seidel with fixed sweep count (maps the reference's
`PgsBoxedLcpSolver`; the Dantzig pivoting path is replaced by PGS + warm
starting, which the reference itself falls back to and which is the
fixed-shape, branch-free formulation a TPU wants).

Backward: `custom_vjp` implementing implicit differentiation through the
converged active set — the core of the reference's gradient engine
(`BackpropSnapshot::getJacobianOfConstraintForce`, BackpropSnapshot.cpp:
2723-2774, and `ConstrainedGroupGradientMatrices::constructMatrices`'
CLAMPING / UPPER_BOUND / NOT_CLAMPING classification, CGGM.cpp:518-608):

    classes fixed  =>  x = R x_C,  Q x_C = b_C,  Q = A[C,:] R
    dL/db = P_C λ,  dL/dA = -λ xᵀ,   with Qᵀ λ = Rᵀ (dL/dx)

AD through the PGS iterations would give noisy/wrong gradients (the
reference's `dart/neural` exists precisely because of this); the implicit
rule gives the exact subgradient of the LCP solution map.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops import linalg_small

_BIG = 1e20
# Reference: ConstrainedGroupGradientMatrices.cpp:24
CLAMPING_THRESHOLD = 1e-6


def _pinv_rtol(dtype):
    """Dtype-scaled pseudoinverse truncation (advisor r3): singular values
    at the dtype's noise floor (~eps·sigma_max) must be truncated, not
    inverted — mirroring this file's eps convention for the regularized
    solves. 1e-12 for f64; ~3e-6 (a few ULPs above eps) for f32, the TPU
    bench dtype."""
    return 1e-12 if dtype == jnp.float64 else 3e-6


def _bounds(x, lo_const, hi_const, fscale, findex: Tuple[int, ...]):
    """Current bounds given friction coupling (findex static)."""
    m = len(findex)
    coupled = jnp.asarray([f >= 0 for f in findex])
    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    xn = x[gather]
    f_hi = fscale * jnp.maximum(xn, 0.0)
    lo = jnp.where(coupled, -f_hi, lo_const)
    hi = jnp.where(coupled, f_hi, hi_const)
    return lo, hi


def pgs_solve(
    A: jax.Array,
    b: jax.Array,
    lo_const: jax.Array,
    hi_const: jax.Array,
    fscale: jax.Array,
    x0: jax.Array,
    findex: Tuple[int, ...],
    iters: int = 60,
) -> jax.Array:
    """Projected Gauss-Seidel, fixed iteration count, warm-startable.

    The row loop is unrolled at trace time (m is static and small); the
    sweep loop is a lax.fori_loop. Under vmap every row update becomes a
    batched scalar op across worlds.
    """
    m = b.shape[0]
    diag = jnp.diagonal(A)
    inv_diag = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 0.0)
    # promote x0's shard_map varying-axes metadata to match b (a replicated
    # zero warm start would otherwise break the fori carry under shard_map)
    x0 = x0 + 0.0 * b
    # static gather index for friction coupling (-1 -> self, masked out)
    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    coupled = jnp.asarray([f >= 0 for f in findex])

    # Row updates: trace-unrolled for small LCPs (fastest — XLA fuses the
    # whole sweep), fori_loop with dynamic indexing for large contact LCPs
    # (compile size used to scale with m and exploded T-step scan graphs).
    def row(i, x):
        resid = A[i] @ x - b[i]
        xi = x[i] - resid * inv_diag[i]
        f_hi = fscale[i] * jnp.maximum(x[gather[i]], 0.0)
        lo_i = jnp.where(coupled[i], -f_hi, lo_const[i])
        hi_i = jnp.where(coupled[i], f_hi, hi_const[i])
        return x.at[i].set(jnp.clip(xi, lo_i, hi_i))

    if m <= 12:
        def sweep(_, x):
            for i in range(m):
                x = row(i, x)
            return x
    else:
        def sweep(_, x):
            return jax.lax.fori_loop(0, m, row, x)

    return jax.lax.fori_loop(0, iters, sweep, x0)


def jacobi_solve(
    A: jax.Array,
    b: jax.Array,
    lo_const: jax.Array,
    hi_const: jax.Array,
    fscale: jax.Array,
    x0: jax.Array,
    findex: Tuple[int, ...],
    iters: int = 10,
) -> jax.Array:
    """Projected Jacobi: one fused vector op per iteration (no sequential
    per-row chain). Converges for the near-diagonal LCPs of joint limits /
    Coulomb friction; frictional contact uses Gauss-Seidel instead."""
    diag = jnp.diagonal(A)
    inv_diag = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 0.0)
    x0 = x0 + 0.0 * b
    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    coupled = jnp.asarray([f >= 0 for f in findex])

    def it(_, x):
        xi = x - (A @ x - b) * inv_diag
        f_hi = fscale * jnp.maximum(x[gather], 0.0)
        lo = jnp.where(coupled, -f_hi, lo_const)
        hi = jnp.where(coupled, f_hi, hi_const)
        return jnp.clip(xi, lo, hi)

    return jax.lax.fori_loop(0, iters, it, x0)


def _classify(x, lo_const, hi_const, fscale, findex: Tuple[int, ...]):
    """Per-row class masks from the converged solution.

    clamping  — constraint holds with equality (interior of the box)
    upper     — friction riding the cone surface, x = s * x_n
    (everything else — separating / inactive — has dx = 0)
    """
    m = x.shape[0]
    coupled = jnp.asarray([f >= 0 for f in findex])
    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    xn = x[gather]
    normal_clamp = (~coupled) & (x > CLAMPING_THRESHOLD) & (hi_const > _BIG / 2)
    f_bound = fscale * jnp.maximum(xn, 0.0)
    fric_active = coupled & (xn > CLAMPING_THRESHOLD)
    at_bound = jnp.abs(jnp.abs(x) - f_bound) <= CLAMPING_THRESHOLD * jnp.maximum(
        1.0, f_bound
    )
    fric_clamp = fric_active & ~at_bound
    fric_upper = fric_active & at_bound
    # Bounded non-friction rows (e.g. joint limits with finite hi): clamping
    # when strictly inside (lo, hi).
    bounded = (~coupled) & (hi_const < _BIG / 2)
    inside = (x > lo_const + CLAMPING_THRESHOLD) & (x < hi_const - CLAMPING_THRESHOLD)
    bounded_clamp = bounded & inside
    # Bilateral equality rows (loop-closure ball/weld joint constraints,
    # BallJointConstraint.cpp:129-141: lo=-inf, hi=+inf): ALWAYS clamping —
    # the constraint holds with equality regardless of impulse sign.
    bilateral = (~coupled) & (lo_const < -_BIG / 2) & (hi_const > _BIG / 2)
    clamping = normal_clamp | fric_clamp | bounded_clamp | bilateral
    upper_sign = jnp.sign(x) * fscale
    return clamping, fric_upper, upper_sign


def direct_boxed_solve(
    A: jax.Array,
    b: jax.Array,
    lo_const: jax.Array,
    hi_const: jax.Array,
    rounds: int = 3,
    polish_sweeps: int = 16,
) -> jax.Array:
    """Direct active-set solve for boxed LCPs WITHOUT friction coupling
    (joint limits, Coulomb rows): the fixed-shape analog of the
    reference's Dantzig path and warm-start short-circuit ("if classes are
    consistent, solve with one matrix inversion",
    BoxedLcpConstraintSolver.cpp:422-458).

    Fixed `rounds` of {solve interior subsystem, project, reclassify} —
    each round is a masked m x m solve, so the op chain is O(rounds), not
    O(m * sweeps). Exact when the active set stabilizes (m is small)."""
    m = b.shape[0]
    dtype = b.dtype
    eye = jnp.eye(m, dtype=dtype)

    def comp_residual(x):
        """Complementarity violation of an in-box iterate (vector ops)."""
        w = A @ x - b
        tol = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
        at_lo = x <= lo_const + tol
        at_hi = x >= hi_const - tol
        r = jnp.where(
            at_lo, jnp.maximum(0.0, -w),
            jnp.where(at_hi, jnp.maximum(0.0, w), jnp.abs(w)),
        )
        return jnp.max(r, initial=0.0)

    # class state: x_bound value for boundary rows; interior mask
    # (ones_like/zeros_like inherit shard_map varying-axes metadata from b —
    # plain constants would break the scan carry under shard_map)
    interior = jnp.ones_like(b) > 0.0
    x = jnp.zeros_like(b)
    # Active-set iterations can 2-cycle on degenerate sets, and a fixed
    # round count may stop mid-cycle — so carry the best-residual iterate
    # seen (branch-free) and return THAT, not the last round's state.
    best_x = jnp.clip(x, lo_const, hi_const)
    best_res = comp_residual(best_x)

    def round_fn(carry, _):
        interior, x, best_x, best_res = carry
        i_mask = interior.astype(dtype)
        x_bound = jnp.clip(x, lo_const, hi_const) * (1.0 - i_mask)
        # solve A_II x_I = b_I − A_IB x_B  (padded to identity off-interior)
        rhs = i_mask * (b - A @ x_bound)
        Af = i_mask[:, None] * A * i_mask[None, :] + jnp.diag(1.0 - i_mask)
        # Af = SPD principal block of (J M⁻¹ Jᵀ + cfm·I) padded with
        # identity. This is the ROBUSTNESS valve (the staged cascade's
        # Dantzig-class stage rescues near-rank-deficient A where PGS
        # stalls), and it runs on the XLA path only — so use the
        # MINIMUM-NORM solve: on rank-deficient principal blocks
        # (coplanar-contact structure, cond ~1e6+) an exact solve blows
        # up along the null space and the reclassification oscillates;
        # the pseudoinverse keeps iterates bounded (the role the
        # reference's complete orthogonal decomposition plays,
        # BackpropSnapshot.cpp:2755).
        # rtol must scale with dtype: f32 singular values carry ~1e-7
        # relative noise (advisor r3) — a 1e-12 cutoff never truncates
        # them and the pseudoinverse amplifies rounding noise on exactly
        # the rank-deficient blocks this valve exists to bound.
        x_int = jnp.linalg.pinv(Af, rtol=_pinv_rtol(dtype)) @ rhs
        x_new = x_int * i_mask + x_bound
        # reclassify: interior rows outside the box go to the boundary;
        # boundary rows with complementarity-violating w come back inside
        w = A @ x_new - b
        below = x_new <= lo_const
        above = x_new >= hi_const
        x_proj = jnp.clip(x_new, lo_const, hi_const)
        want_in = (below & (w < 0.0)) | (above & (w > 0.0))
        interior_new = (~below & ~above) | want_in
        res = comp_residual(x_proj)
        better = res < best_res
        best_x = jnp.where(better, x_proj, best_x)
        best_res = jnp.where(better, res, best_res)
        return (interior_new, x_proj, best_x, best_res), None

    (interior, x, best_x, best_res), _ = jax.lax.scan(
        round_fn, (interior, x, best_x, best_res), None, length=rounds
    )
    # Projected Gauss-Seidel polish from the best iterate: the active-set
    # rounds can cycle without ever visiting the solution on degenerate
    # sets; PGS is monotonically convergent for SPD A (it is exact and
    # idempotent when the rounds already resolved the set), so the final
    # answer is guaranteed to improve on best_x. Maps the reference's
    # Dantzig→PGS fallback (BoxedLcpConstraintSolver.cpp:390-470).
    if polish_sweeps > 0:
        zero_fs = jnp.zeros_like(b)
        best_x = pgs_solve(
            A, b, lo_const, hi_const, zero_fs, best_x,
            tuple([-1] * m), iters=polish_sweeps,
        )
    # Exact Newton polish on the final active set: the rounds solve with a
    # pseudoinverse (bounded iterates on rank-deficient sets) whose SVD
    # rounding costs ~1e-7 absolute precision; one EXACT solve on the
    # resolved set restores machine precision, and is kept only when it
    # actually lowers the complementarity residual (so degenerate sets
    # where the exact solve blows up along the null space are unaffected).
    tolp = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
    ip = ((best_x > lo_const + tolp) & (best_x < hi_const - tolp)).astype(dtype)
    xb = jnp.clip(best_x, lo_const, hi_const) * (1.0 - ip)
    rhs_p = ip * (b - A @ xb)
    Afp = ip[:, None] * A * ip[None, :] + jnp.diag(1.0 - ip)
    x_pol = jnp.clip(
        linalg_small.solve_spd(Afp, rhs_p) * ip + xb, lo_const, hi_const
    )
    better_p = comp_residual(x_pol) < comp_residual(best_x)
    return jnp.where(better_p, x_pol, best_x)


def direct_boxed_solve_lane(
    A: jax.Array,
    b: jax.Array,
    lo_const: jax.Array,
    hi_const: jax.Array,
    rounds: int = 3,
    polish_sweeps: int = 8,
) -> jax.Array:
    """Lane-evaluable variant of `direct_boxed_solve` (same active-set
    round structure) for the fused class-rollout kernels: the round scan
    is unrolled (rounds is tiny), the pseudoinverse becomes a regularized
    normal-equation solve through the unrolled SPD path, and the PGS
    polish unrolls its sweeps — no control flow, no gather, no pivoting,
    so `ops/lanevmap.lane_eval` can emit it inside a Pallas kernel."""
    m = b.shape[0]
    dtype = b.dtype
    eye = jnp.eye(m, dtype=dtype)
    eps = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-5, dtype)

    def comp_residual(x):
        w = A @ x - b
        tol = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
        at_lo = x <= lo_const + tol
        at_hi = x >= hi_const - tol
        r = jnp.where(
            at_lo, jnp.maximum(0.0, -w),
            jnp.where(at_hi, jnp.maximum(0.0, w), jnp.abs(w)),
        )
        return jnp.max(r, initial=0.0)

    def subsolve(i_mask, x):
        x_bound = jnp.clip(x, lo_const, hi_const) * (1.0 - i_mask)
        rhs = i_mask * (b - A @ x_bound)
        Af = i_mask[:, None] * A * i_mask[None, :] + eye * (1.0 - i_mask)
        scale = jnp.maximum(jnp.max(jnp.abs(Af)), 1.0)
        AtA = Af.T @ Af + (eps * scale * scale) * eye
        x_int = linalg_small.solve_spd(AtA, Af.T @ rhs)
        return x_int * i_mask + x_bound

    interior = jnp.ones_like(b) > 0.0
    x = jnp.zeros_like(b)
    best_x = jnp.clip(x, lo_const, hi_const)
    best_res = comp_residual(best_x)
    for _ in range(rounds):
        x_new = subsolve(interior.astype(dtype), x)
        w = A @ x_new - b
        below = x_new <= lo_const
        above = x_new >= hi_const
        x = jnp.clip(x_new, lo_const, hi_const)
        want_in = (below & (w < 0.0)) | (above & (w > 0.0))
        interior = (~below & ~above) | want_in
        res = comp_residual(x)
        better = res < best_res
        best_x = jnp.where(better, x, best_x)
        best_res = jnp.where(better, res, best_res)
    # unrolled projected Gauss-Seidel polish (rows static, no coupling)
    x = best_x
    diag = jnp.sum(A * eye, axis=-1)  # gather-free diagonal (lane-safe)
    inv_diag = jnp.where(jnp.abs(diag) > 1e-12, 1.0 / diag, 0.0)
    for _ in range(polish_sweeps):
        for i in range(m):
            resid = A[i] @ x - b[i]
            xi = jnp.clip(x[i] - resid * inv_diag[i],
                          lo_const[i], hi_const[i])
            # one-hot masked row update: .at[i].set lowers to scatter,
            # which is not lane-evaluable
            x = x + eye[i] * (xi - x[i])
    better = comp_residual(x) < best_res
    return jnp.where(better, x, best_x)


def classify_lane(x, lo_const, hi_const, fscale, findex: Tuple[int, ...]):
    """`_classify` with the friction-coupling gather done at TRACE time
    (findex is static) — lane-evaluable."""
    coupled = jnp.asarray([f >= 0 for f in findex])
    xn = jnp.stack([x[max(f, 0)] for f in findex])
    normal_clamp = (~coupled) & (x > CLAMPING_THRESHOLD) & (hi_const > _BIG / 2)
    f_bound = fscale * jnp.maximum(xn, 0.0)
    fric_active = coupled & (xn > CLAMPING_THRESHOLD)
    at_bound = jnp.abs(jnp.abs(x) - f_bound) <= CLAMPING_THRESHOLD * jnp.maximum(
        1.0, f_bound
    )
    fric_clamp = fric_active & ~at_bound
    fric_upper = fric_active & at_bound
    bounded = (~coupled) & (hi_const < _BIG / 2)
    inside = (x > lo_const + CLAMPING_THRESHOLD) & (x < hi_const - CLAMPING_THRESHOLD)
    bounded_clamp = bounded & inside
    bilateral = (~coupled) & (lo_const < -_BIG / 2) & (hi_const > _BIG / 2)
    clamping = normal_clamp | fric_clamp | bounded_clamp | bilateral
    upper_sign = jnp.sign(x) * fscale
    return clamping, fric_upper, upper_sign


def lcp_residual(A, x, b, lo_const, hi_const, fscale, findex: Tuple[int, ...]):
    """Boxed-complementarity residual of a candidate solution, with
    friction-coupled bounds resolved (the convergence measure the
    reference's PGS option `mEpsilonForDivision`/validation step uses —
    LCPUtils::isLCPSolutionValid semantics, dart/math/LCPUtils.cpp:12).
    Returns a scalar max-violation; 0 = exact solution."""
    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    coupled = jnp.asarray([f >= 0 for f in findex])
    f_hi = fscale * jnp.maximum(x[gather], 0.0)
    lo_i = jnp.where(coupled, -f_hi, lo_const)
    hi_i = jnp.where(coupled, f_hi, hi_const)
    w = A @ x - b
    # boundary detection tolerance scales with the impulse magnitude only
    # (hi contains the +-1e20 unbounded sentinels — never scale by it)
    tol = jnp.asarray(
        1e-10 if b.dtype == jnp.float64 else 1e-6, b.dtype
    ) * jnp.maximum(1.0, jnp.max(jnp.abs(x), initial=0.0))
    at_lo = x <= lo_i + tol
    at_hi = x >= hi_i - tol
    r = jnp.where(
        at_lo, jnp.maximum(0.0, -w),
        jnp.where(at_hi, jnp.maximum(0.0, w), jnp.abs(w)),
    )
    # out-of-box violation counts too
    oob = jnp.maximum(lo_i - x, 0.0) + jnp.maximum(x - hi_i, 0.0)
    return jnp.max(r + oob, initial=0.0)


def staged_solve(A, b, lo, hi, fscale, x0, findex, iters=60, tol=1e-8):
    """The reference's staged fallback chain
    (BoxedLcpConstraintSolver.cpp:390-470: Dantzig direct pivoting →
    secondary PGS with deeper settings → ignore friction), as a
    residual-gated cascade:

      1. PGS at the standard sweep count (warm-started)
      2. if residual > tol: 10x deeper PGS continuation
      3. if still > tol: DIRECT active-set solve with the friction-cone
         bounds frozen at the current governing normal impulses (the
         Dantzig-class stage — PGS stalls on ill-conditioned /
         rank-deficient A where pivoting converges immediately), then one
         standard PGS re-polish with the cone coupling live

    Each stage runs under `lax.cond`, so an unbatched solve that converges
    at stage 1 pays nothing extra (vmapped worlds pay the select — this
    method is the opt-in robustness valve, not the MPC hot path). Returns
    the lowest-residual candidate seen."""
    x1 = pgs_solve(A, b, lo, hi, fscale, x0, findex, iters)
    r1 = lcp_residual(A, x1, b, lo, hi, fscale, findex)

    def deep(x):
        return pgs_solve(A, b, lo, hi, fscale, x, findex, 10 * iters)

    x2 = jax.lax.cond(r1 > tol, deep, lambda x: x, x1)
    r2 = lcp_residual(A, x2, b, lo, hi, fscale, findex)
    # keep the better of stages 1/2 (a deeper PGS continuation can, rarely,
    # regress on cycling problems)
    x2 = jnp.where(r2 < r1, x2, x1)
    r2 = jnp.minimum(r2, r1)

    gather = jnp.asarray([max(f, 0) for f in findex], dtype=jnp.int32)
    coupled = jnp.asarray([f >= 0 for f in findex])

    def direct_stage(x):
        # freeze friction bounds at the current governing impulses; the
        # boxed problem becomes constant-bounds and pivoting applies
        f_hi = fscale * jnp.maximum(x[gather], 0.0)
        lo_f = jnp.where(coupled, -f_hi, lo)
        hi_f = jnp.where(coupled, f_hi, hi)
        xd = direct_boxed_solve(A, b, lo_f, hi_f, rounds=8)
        return pgs_solve(A, b, lo, hi, fscale, xd, findex, iters)

    x3 = jax.lax.cond(r2 > 10 * tol, direct_stage, lambda x: x, x2)
    r3 = lcp_residual(A, x3, b, lo, hi, fscale, findex)
    # keep whichever candidate actually has the lower residual
    return jnp.where(r3 < r2, x3, x2)


def _solve(A, b, lo, hi, fscale, x0, findex, iters, method):
    if method == "direct":
        return direct_boxed_solve(A, b, lo, hi, rounds=min(iters, 4))
    if method == "staged":
        return staged_solve(A, b, lo, hi, fscale, x0, findex, iters)
    fn = jacobi_solve if method == "jacobi" else pgs_solve
    return fn(A, b, lo, hi, fscale, x0, findex, iters)


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8))
def boxed_lcp(A, b, lo_const, hi_const, fscale, x0, findex: Tuple[int, ...],
              iters=60, method="gs"):
    return _solve(A, b, lo_const, hi_const, fscale, x0, findex, iters, method)


@boxed_lcp.defjvp
def _boxed_lcp_jvp(findex, iters, method, primals, tangents):
    """Implicit active-set derivative, LINEAR in the tangents — so JAX both
    pushes jvps (jacfwd linearization in iLQR) and transposes it for
    reverse-mode (loss gradients), one rule for both.

        classes fixed:  x = R x_C,   Q x_C = b_C,   Q = A[C,:] R
        dx = R Q⁻¹ P_Cᵀ (db − dA x)
    """
    A, b, lo_const, hi_const, fscale, x0 = primals
    dA, db, _dlo, _dhi, _dfs, _dx0 = tangents
    x = _solve(A, b, lo_const, hi_const, fscale, x0, findex, iters, method)
    m = b.shape[0]
    dtype = b.dtype
    clamping, upper, s = _classify(x, lo_const, hi_const, fscale, findex)

    # R: x = R x_C with classes fixed. Columns: for j clamping,
    # R[j,j] = 1 and R[i,j] = s_i for upper-bound rows i governed by j.
    eye = jnp.eye(m, dtype=dtype)
    gov = jnp.zeros((m, m), dtype=dtype)
    for i, f in enumerate(findex):
        if f >= 0:
            gov = gov.at[i, f].set(1.0)
    S = (upper.astype(dtype) * s)[:, None] * gov                    # (m, m)
    cmask = clamping.astype(dtype)
    R = (eye + S) * cmask[None, :]

    # Q = A[C,:] R, padded to identity off the clamping set.
    AR = A @ R
    Qf = cmask[:, None] * AR * cmask[None, :] + jnp.diag(1.0 - cmask)

    rhs = cmask * (db - dA @ x)
    # Solve Qf dx_C = rhs robustly (reference uses a complete orthogonal
    # decomposition = pseudoinverse for degenerate Q, BackpropSnapshot.cpp:
    # 2755).
    if m <= 24:
        # MPC-relevant sizes: regularized normal equations + unrolled SPD
        # solve (kernel-friendly, no pivoting). The regularization must be
        # scaled to the dtype AND to Q's magnitude: a fixed 1e-12
        # underflows in f32 and the normal equations square the
        # conditioning.
        eps = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-5, dtype)
        qscale = jnp.maximum(jnp.max(jnp.abs(Qf)), 1.0)
        QtQ = Qf.T @ Qf + (eps * qscale * qscale) * jnp.eye(m, dtype=dtype)
        dx_C = linalg_small.solve_spd(QtQ, Qf.T @ rhs)
    else:
        # Large degenerate systems (many coplanar contacts, cond(A) ~ 1e5+
        # on real steps): normal equations square the conditioning and cap
        # tangent agreement with the reference kernel at ~1e-3; a true
        # pseudoinverse matches the reference's COD to ~1e-9 (measured,
        # tests/test_parity_lcp_grad.py). pinv(Qf) depends only on the
        # PRIMAL Qf, so dx stays linear in the tangents and the rule
        # transposes for reverse mode.
        dx_C = jnp.linalg.pinv(Qf, rtol=_pinv_rtol(dtype)) @ rhs
    dx = R @ (cmask * dx_C)
    return x, dx

"""Frozen-active-set contact dynamics — the contact-MPC fast path.

The reference's MPC steady state rests on one observation: across a replan,
the LCP active set barely changes, so the boxed LCP collapses to ONE linear
solve on the warm-started classes ("if classes are consistent, solve with
one matrix inversion" — /root/reference/dart/constraint/
BoxedLcpConstraintSolver.cpp:422-458). This module is that observation
turned into a smooth planning dynamics:

    given per-step class masks (clamping c, upper u with signed scale s),
    x = R x_C,  (A[C,:] R) x_C = b_C,  v' = v* + M⁻¹Jᵀ x

— exactly the linear system the implicit LCP derivative uses
(`ops/lcp.py:_boxed_lcp_jvp`, mapping BackpropSnapshot::
getJacobianOfConstraintForce, BackpropSnapshot.cpp:2723-2774), but used as
the PRIMAL step. With classes frozen the step is C¹-smooth in (q, v, τ),
plain `jax.jacfwd` linearizes it (no LCP iterations, no custom_jvp), and —
because the assembly is gather/control-flow-free (`build_constraint_system(
planner=True)`) — it runs inside the lane-batched Pallas kernels
(ops/lanevmap.py), unlocking the fused iLQR pipeline for contact models.

MPC usage (trajectory/ilqr.py `ilqr_solve`/`ilqr_solve_batch` with
`frozen`): the mode sequence comes from ONE full-LCP rollout per replan
(`rollout_classes`), warm-started from the previous plan — the same
temporal reuse as the reference's cached LCP solution.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import linalg_small
from nimblephysics_tpu.ops.collide import detect_contacts
from nimblephysics_tpu.ops.contact import (
    build_constraint_system,
    contact_step,
    lcp_dim,
    lcp_findex,
)
from nimblephysics_tpu.simulation import step as step_mod


class FrozenClasses(NamedTuple):
    """Per-step LCP class masks (leading axes broadcast over time/batch)."""

    cmask: jax.Array   # (..., m) float: 1.0 where the row is CLAMPING
    us: jax.Array      # (..., m) float: sign * fscale where UPPER, else 0


def gov_matrix(model: Model) -> np.ndarray:
    """(m, m) constant: gov[i, findex_i] = 1 for coupled rows (static)."""
    fi = lcp_findex(model)
    m = len(fi)
    gov = np.zeros((m, m))
    for i, f in enumerate(fi):
        if f >= 0:
            gov[i, f] = 1.0
    return gov


def classes_from_info(info) -> FrozenClasses:
    """FrozenClasses from a ContactSolveInfo (full LCP solve)."""
    dtype = info.impulses.dtype
    return FrozenClasses(
        cmask=info.clamping.astype(dtype),
        us=info.upper.astype(dtype) * info.upper_sign,
    )


def solve_frozen(A, b, classes: FrozenClasses, gov: jax.Array,
                 cg_iters: Optional[int] = None) -> jax.Array:
    """Impulses on a frozen class structure (the warm-start short-circuit).

    Same algebra as the LCP implicit-derivative rule (`ops/lcp.py`):
    R = (I + diag(us) gov) restricted to clamping columns; solve the
    clamping subsystem via regularized normal equations (the reference uses
    a complete orthogonal decomposition for the same robustness,
    BackpropSnapshot.cpp:2755)."""
    m = b.shape[-1]
    dtype = b.dtype
    eye = jnp.eye(m, dtype=dtype)
    cmask = classes.cmask
    R = (eye + classes.us[..., :, None] * gov) * cmask[..., None, :]
    AR = A @ R
    Qf = (
        cmask[..., :, None] * AR * cmask[..., None, :]
        + eye * (1.0 - cmask)[..., :, None]
    )
    rhs = cmask * b
    eps = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-5, dtype)
    qscale = jnp.maximum(jnp.max(jnp.abs(Qf), axis=(-2, -1), keepdims=True), 1.0)
    reg = (eps * qscale * qscale)[..., 0]
    QfT = jnp.swapaxes(Qf, -1, -2)

    # Regularized normal equations solved by CGNR under
    # `lax.custom_linear_solve`: x minimizes |Qf x − rhs|² + reg |x|²,
    # i.e. (QfᵀQf + reg I) x = Qfᵀ rhs — the same system the reference's
    # complete-orthogonal-decomposition solve answers for degenerate Q
    # (BackpropSnapshot.cpp:2755). Three load-bearing choices for the
    # fused TPU lane kernels (round-3 Mosaic bisects):
    #   * CG, not direct Gauss-Jordan — the m=27 GJ op mix crashed the
    #     Mosaic compile helper; CG's matvec-only graph compiles;
    #   * matvecs as einsum — a bare dot_general with NO expand/squeeze
    #     pair around it (squeeze-of-middle-singleton feeding the
    #     unrolled lane dot was another crash);
    #   * custom_linear_solve — the JVP becomes ONE tangent CG solve
    #     (implicit differentiation: M dx = d(Qfᵀrhs) − dM·x) instead of
    #     AD interleaving tangents through every CG iteration; the graph
    #     stays two separate CG chains, which compiles, and the implicit
    #     tangent is exact at convergence (and transposes for reverse
    #     mode, unlike a hand-rolled nonlinear-in-rhs rule).
    def mv(M, v):
        return jnp.einsum("...ij,...j->...i", M, v)

    # Keep the CGNR (two-matvec) form in ALL paths. Materializing
    # Mn = QfᵀQf once and doing one matvec per CG iteration was tried in
    # round 4 and MEASURED SLOWER in the lane kernels (worm 1187 -> 1037,
    # cheetah 451 -> 405 solves/s): the m³ outer-product accumulation
    # unrolls to m sequential (m, m)-sized multiply-adds with heavy VMEM
    # churn, costing more than the per-iteration matvec it saves — and it
    # also loses ~1 bit of the unsquared form's accuracy.
    def matvec(p):
        return mv(QfT, mv(Qf, p)) + reg * p

    # Jacobi-preconditioned CG (advisor r3): "exact in <= m steps" only
    # holds in exact arithmetic — in f32 with cond(QfᵀQf) up to ~1/eps,
    # plain CG at m+6 iterations can leave real residual on ill-
    # conditioned coplanar-contact systems. diag(QfᵀQf) + reg is cheap,
    # elementwise (lane-kernel safe), and restores the convergence margin
    # (asserted against solve_spd in tests/test_frozen_contact.py).
    diagM = jnp.sum(Qf * Qf, axis=-2) + reg

    # cg_iters: None = m+6 (exact-in-m on SPD, the plant default).
    # Planners may pass fewer: with Jacobi preconditioning and the
    # identity rows of non-clamping constraints, PCG converges in
    # ~(#active rows + 1) iterations — far below m on typical contact
    # states (measured: 16 iters reproduces the full solve to ~1e-6 on
    # the bench models' settled states; trajectory/ilqr.ILQRConfig.
    # planner_cg_iters).
    n_cg = (m + 6) if cg_iters is None else int(cg_iters)

    def cg_solve(mv_fn, bb):
        x = jnp.zeros_like(bb)
        r = bb
        z = r / diagM
        p = z
        rz = jnp.sum(r * z, axis=-1)
        tiny = jnp.asarray(1e-30, dtype)
        for _ in range(n_cg):
            Ap = mv_fn(p)
            alpha = rz / (jnp.sum(p * Ap, axis=-1) + tiny)
            x = x + alpha[..., None] * p
            r = r - alpha[..., None] * Ap
            z = r / diagM
            rz_new = jnp.sum(r * z, axis=-1)
            p = z + (rz_new / (rz + tiny))[..., None] * p
            rz = rz_new
        return x

    bvec = mv(QfT, rhs)
    x_C = jax.lax.custom_linear_solve(
        matvec, bvec, cg_solve, symmetric=True
    )
    return mv(R, cmask * x_C)


def frozen_contact_step(
    model: Model,
    state: State,
    tau: jax.Array,
    classes: FrozenClasses,
    gov: Optional[jax.Array] = None,
    servo_cmd: Optional[jax.Array] = None,
    cg_iters: Optional[int] = None,
) -> State:
    """One smooth constrained step on a frozen mode (planning dynamics)."""
    q, v = state.q, state.v
    kin0 = dyn.forward_kinematics(model, q)
    qdd = dyn.aba(model, q, v, tau, kin=kin0)
    v_star = v + model.dt * qdd
    if lcp_dim(model) == 0:
        q_next = step_mod.integrate_positions(model, q, v)
        return State(q_next, v_star)
    contacts = detect_contacts(model, kin0.T_wb)
    J, A, b, lo, hi, fscale, Minv_Jt = build_constraint_system(
        model, q, v_star, kin0, contacts, servo_cmd, planner=True
    )
    if gov is None:
        gov = jnp.asarray(gov_matrix(model), dtype=q.dtype)
    x = solve_frozen(A, b, classes, gov, cg_iters=cg_iters)
    v_next = v_star + Minv_Jt @ x
    q_next = step_mod.integrate_positions(model, q, v)
    return State(q_next, v_next)


def planner_reduce_contacts(model: Model, keep_bodies) -> Model:
    """Planner-model transform: keep collision shapes only on the named
    bodies (plus static world geometry). The standard MPC practice — a
    half-cheetah planner tracks foot-ground contact, not the 29
    self-collision pairs the simulated plant also resolves — and it keeps
    the frozen LCP small enough for the lane kernels (m scales the frozen
    solve quadratically). The PLANT keeps the full shape set."""
    keep = set(keep_bodies)
    shapes = tuple(
        sp
        for sp in model.shapes
        if sp.body_index < 0 or model.body_names[sp.body_index] in keep
    )
    return model.replace(shapes=shapes)


def classify_points(model: Model, xs_flat: jax.Array, taus: jax.Array,
                    x_warm: Optional[jax.Array] = None):
    """POINTWISE mode classification: solve the full boxed LCP
    independently at every trajectory point (arbitrary leading batch
    axes) and return its class masks + impulses.

    This decouples mode refresh from sequential simulation: where
    `rollout_classes` scans T full-LCP steps one after another (the
    sequential bottleneck of a replan — measured ~0.8-1.1 s at B=1024,
    T=100 on v5e), the pointwise solve classifies all B·T points of the
    PREVIOUS plan in one embarrassingly-parallel batch. Combined with
    the fused frozen rollout in a fixed-point loop (see
    `trajectory/ilqr.solve_contact_mpc_batch(class_refresh=
    "pointwise")`) it converges to the same mode-consistency condition
    the frozen path assumes — the reference's cached-LCP warm-start
    carried across steps (BoxedLcpConstraintSolver.cpp:422-458), updated
    in parallel instead of in sequence."""
    from nimblephysics_tpu.ops.contact import contact_step

    def one(xf, tauv, xw):
        _, info = contact_step(
            model, State.from_flat(xf), tauv, x_warm=xw, return_info=True
        )
        return classes_from_info(info), info.impulses

    m = lcp_dim(model)
    if x_warm is None:
        x_warm = jnp.zeros(xs_flat.shape[:-1] + (m,), dtype=xs_flat.dtype)
    f = one
    for _ in range(xs_flat.ndim - 1):
        f = jax.vmap(f)
    return f(xs_flat, taus, x_warm)


def fused_class_rollout_ok(model: Model) -> bool:
    """True when the FULL constrained step (non-planner assembly + direct
    boxed LCP + classify) is lane-evaluable, so the per-replan mode
    rollout can run as one fused Pallas kernel (`ops/pallas_rollout.
    rollout_classes_pallas`) instead of a T-step XLA scan of tiny ops —
    the measured bottleneck of limits-only replans (1.39 s of a 1.45 s
    cartpole-limits replan at B=2048, round 5). Conditions: no contact
    slots (frictional contact needs the PGS sweep loop), no loop
    closures (logm_so3 branch select), no servo commands plumbed, linear
    position integration, and the pivot-free mass solve's size cap."""
    from nimblephysics_tpu.ops.collide import total_slots

    return (
        total_slots(model) == 0
        and not model.loops
        and not model.servo_dofs
        and model.nq <= 40
        and all(t not in ("ball", "free") for t in model.joint_types)
    )


def step_with_classes_for_trace(model: Model):
    """Lane-safe FULL constrained step returning (x', cmask, us) — the
    body of the fused class-rollout kernel. Exact same math as
    `contact_step(..., return_info=True)` for models passing
    `fused_class_rollout_ok` (direct active-set LCP, the limits/Coulomb
    path), with the lane-evaluable solver/classify variants."""
    from nimblephysics_tpu.ops.lcp import (
        classify_lane,
        direct_boxed_solve_lane,
    )
    from nimblephysics_tpu.ops.pallas_linearize import _tau_stack

    findex = lcp_findex(model)

    def step_fn(x, u):
        s = State.from_flat(x)
        q, v = s.q, s.v
        tau = _tau_stack(model, u, x.dtype)
        kin0 = dyn.forward_kinematics(model, q)
        qdd = dyn.aba(model, q, v, tau, kin=kin0)
        v_star = v + model.dt * qdd
        contacts = detect_contacts(model, kin0.T_wb)
        J, A, b, lo, hi, fscale, Minv_Jt = build_constraint_system(
            model, q, v_star, kin0, contacts, None, planner=False,
            spd_solve=True,
        )
        x_imp = direct_boxed_solve_lane(A, b, lo, hi)
        v_next = v_star + Minv_Jt @ x_imp
        q_next = step_mod.integrate_positions(model, q, v)
        cl, up, sgn = classify_lane(x_imp, lo, hi, fscale, findex)
        x2 = jnp.concatenate([q_next, v_next])
        return x2, cl.astype(x.dtype), up.astype(x.dtype) * sgn

    return step_fn


def rollout_classes(model: Model, state0: State, actions: jax.Array):
    """Full-LCP rollout that records the per-step mode sequence.

    Returns (final_state, traj, FrozenClasses with leading time axis,
    impulses (T, m)) — the once-per-replan pass that refreshes the frozen
    mode sequence (reference: the cached LCP solution carried across steps,
    World::getCachedLCPSolution)."""
    from nimblephysics_tpu.ops.contact import contact_step

    m = lcp_dim(model)
    x0 = jnp.zeros(m, dtype=state0.q.dtype) + 0.0 * state0.q[0]

    def body(carry, a):
        s, x_prev = carry
        s2, info = contact_step(
            model, s, model.action_to_tau(a), x_warm=x_prev, return_info=True
        )
        cl = classes_from_info(info)
        return (s2, info.impulses), (s2, cl, info.impulses)

    (final, _), (traj, classes, impulses) = jax.lax.scan(
        body, (state0, x0), actions
    )
    return final, traj, classes, impulses

"""The constrained timestep: collision → boxed LCP → impulse application.

Functional fusion of the reference's `ConstraintSolver::solve()` pipeline
(`ConstraintSolver.cpp:376`: updateConstraints → buildConstrainedGroups →
solveConstrainedGroups) with Nimble's differentiable step semantics
(`World::step`, World.cpp:221-254):

    q̈   = ABA(q, v, tau)                     unconstrained forward dynamics
    v*   = v + dt q̈                           pre-constraint velocity
    x    = BoxedLCP(J M⁻¹ Jᵀ + cfm·I, −J v* + bounce)   impulses
    v'   = v* + M⁻¹ Jᵀ x
    q'   = integrate(q, v)                    pre-step velocity (Nimble)

Differences from the reference, by TPU design:
  * contact slots are static topology (ops/collide.py) — no dynamic
    constraint groups; inactive slots are masked rows of one padded LCP
  * the whole group structure (union-find, ConstraintSolver.cpp:723-790)
    collapses: batched worlds are independent, and within one world the
    padded dense LCP subsumes per-group solves at these sizes
  * contact gradients = AD through differentiable collision + the LCP
    custom_vjp (ops/lcp.py) — replacing 16 kLoC of `dart/neural`
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import lcp as lcp_mod
from nimblephysics_tpu.ops.collide import ContactSlots, detect_contacts, total_slots
from nimblephysics_tpu.simulation import step as step_mod

# Reference constants: ContactConstraint.cpp:46-48, DART_RESTITUTION_* etc.
CFM = 1e-5
ERP = 0.01
MAX_ERV = 1e-3
ERROR_ALLOWANCE = 0.0  # DART_ERROR_ALLOWANCE
RESTITUTION_THRESHOLD = 1e-3
BOUNCING_VELOCITY_THRESHOLD = 1e-1  # DART_BOUNCING_VELOCITY_THRESHOLD
MAX_BOUNCING_VELOCITY = 1e2
_BIG = lcp_mod._BIG


def limited_dofs(model: Model) -> Tuple[int, ...]:
    """Dofs with any finite position limit (static)."""
    import numpy as np

    lo = np.asarray(model.q_lower)
    hi = np.asarray(model.q_upper)
    return tuple(
        int(d) for d in range(model.nq) if np.isfinite(lo[d]) or np.isfinite(hi[d])
    )


def coulomb_dofs(model: Model) -> Tuple[int, ...]:
    """Dofs with static Coulomb joint friction
    (JointCoulombFrictionConstraint)."""
    import numpy as np

    try:
        cf = np.asarray(model.coulomb_friction)
    except Exception:  # traced (domain-randomized): give every dof a row
        return tuple(range(model.nq))
    return tuple(int(d) for d in range(model.nq) if cf[d] > 0.0)


def loop_rows(model: Model) -> int:
    """LCP rows contributed by loop-closure constraints: 3 per ball joint
    constraint, 6 per weld (BallJointConstraint.hpp:46 'getDimension() = 3',
    WeldJointConstraint: 6)."""
    return sum(3 if kind == "ball" else 6 for kind, _, _ in model.loops)


def lcp_dim(model: Model) -> int:
    return (
        3 * total_slots(model)
        + 2 * len(limited_dofs(model))
        + len(coulomb_dofs(model))
        + len(model.servo_dofs)
        + len(model.mimic)
        + loop_rows(model)
    )


def lcp_findex(model: Model) -> Tuple[int, ...]:
    """Static friction-coupling index per LCP row."""
    fi = []
    for k in range(total_slots(model)):
        fi.extend([-1, 3 * k, 3 * k])
    fi.extend([-1] * (2 * len(limited_dofs(model))))
    fi.extend([-1] * len(coulomb_dofs(model)))
    fi.extend([-1] * (len(model.servo_dofs) + len(model.mimic)))
    fi.extend([-1] * loop_rows(model))
    return tuple(fi)


def _tangent_basis(n: jax.Array):
    """ODE-style tangent basis (ContactConstraint::getTangentBasisMatrixODE):
    first frictional direction is +Z with X fallback, made branch-free.
    Batched: n (..., 3) -> (t1, t2) each (..., 3)."""
    # constant basis vectors via broadcast (scatter-free: lane-kernel safe)
    z = jnp.zeros_like(n) + jnp.asarray([0.0, 0.0, 1.0], n.dtype)
    x = jnp.zeros_like(n) + jnp.asarray([1.0, 0.0, 0.0], n.dtype)
    t_z = jnp.cross(z, n)
    t_x = jnp.cross(x, n)
    use_z = (jnp.sum(t_z * t_z, axis=-1) > 1e-12)[..., None]
    t = jnp.where(use_z, t_z, t_x)
    t = t / jnp.sqrt(jnp.maximum(jnp.sum(t * t, axis=-1, keepdims=True), 1e-18))
    t2 = jnp.cross(n, t)
    return t, t2


class ContactSolveInfo(NamedTuple):
    """Post-step constraint diagnostics (the BackpropSnapshot's recorded
    quantities, exposed for tests, warm starting, and the frozen-active-set
    MPC fast path — the class masks are the reference's CLAMPING/UPPER_BOUND
    classification, ConstrainedGroupGradientMatrices.cpp:518-608)."""

    impulses: jax.Array       # (m,) LCP solution
    contacts: ContactSlots
    J: jax.Array              # (m, nq) constraint Jacobian
    v_star: jax.Array         # pre-constraint velocity
    clamping: jax.Array       # (m,) bool: constraint holds with equality
    upper: jax.Array          # (m,) bool: friction riding the cone surface
    upper_sign: jax.Array     # (m,) sign(x_i) * fscale_i for upper rows
    residual: jax.Array = jnp.zeros(())  # scalar boxed-complementarity
    #   violation of the returned impulses (ops/lcp.py lcp_residual — the
    #   reference surfaces this via LCPUtils::isLCPSolutionValid)


def build_constraint_system(
    model: Model,
    q: jax.Array,
    v_star: jax.Array,
    kin,
    contacts: ContactSlots,
    servo_cmd: Optional[jax.Array] = None,
    planner: bool = False,
    spd_solve: Optional[bool] = None,
):
    """Assemble J, A, b, bounds for the padded boxed LCP.

    `planner=True` builds the SMOOTH planning variant used by the
    frozen-active-set MPC fast path (ops/frozen_contact.py): contact-slot
    activation gates and restitution bounce are dropped (the frozen class
    masks decide row activity instead — the reference's warm-start
    steady-state assumption, BoxedLcpConstraintSolver.cpp:422-458), and the
    mass solve uses the pivot-free unrolled path so the whole assembly is
    gather-free/control-flow-free (lane-kernel compatible).
    """
    nq = model.nq
    dtype = q.dtype
    K = len(contacts.body_a)
    Ld = limited_dofs(model)
    m = 3 * K + 2 * len(Ld)

    if K:
        Jw = dyn.world_jacobian(model, kin)  # (nb, 6, nq)
        # ---- fully vectorized contact rows (no per-slot Python graphs) ----
        # static body selection (trace-time stack: gather-free; slot body
        # indices are static topology)
        zero6 = jnp.zeros((6, nq), dtype=dtype)
        Ja = jnp.stack([Jw[b] if b >= 0 else zero6 for b in contacts.body_a])
        Jb = jnp.stack([Jw[b] if b >= 0 else zero6 for b in contacts.body_b])
        p = contacts.point                            # (K, 3)

        def point_jac(Jfull):
            # (K, 3, nq): linear + omega x p  with world-origin spatial ref
            return Jfull[:, 3:, :] + jnp.cross(
                Jfull[:, :3, :], p[:, :, None], axis=1
            )

        Jp = point_jac(Ja) - point_jac(Jb)            # (K, 3, nq)
        n = contacts.normal
        t1, t2 = _tangent_basis(n)
        dirs = jnp.stack([n, t1, t2], axis=1)         # (K, 3, 3)
        if planner:
            # frozen-class planning: row activity comes from the class
            # masks, not the (discontinuous) penetration gate
            act = jnp.ones((K,), dtype)
        else:
            act = contacts.active.astype(dtype)       # (K,)
        rows_c = act[:, None, None] * jnp.einsum("kdi,kin->kdn", dirs, Jp)

        rel_v = jnp.einsum("kdn,n->kd", rows_c, v_star)   # (K, 3)
        neg_vn = -rel_v[:, 0]
        e = contacts.restitution
        restitution_vel = jnp.where(e > RESTITUTION_THRESHOLD, neg_vn * e, 0.0)
        bounce = jnp.where(
            restitution_vel > BOUNCING_VELOCITY_THRESHOLD,
            jnp.minimum(restitution_vel, MAX_BOUNCING_VELOCITY),
            0.0,
        )
        if planner:
            bounce = jnp.zeros_like(bounce)
        b_c = jnp.stack(
            [act * (neg_vn + bounce), -act * rel_v[:, 1], -act * rel_v[:, 2]],
            axis=1,
        )
        zero_k = jnp.zeros((K,), dtype)
        hi_c = jnp.stack([act * _BIG, zero_k, zero_k], axis=1)
        mu = contacts.friction * act
        fs_c = jnp.stack([zero_k, mu, mu], axis=1)

        J = rows_c.reshape(3 * K, nq)
        b = b_c.reshape(3 * K)
        lo = jnp.zeros(3 * K, dtype)
        hi = hi_c.reshape(3 * K)
        fscale = fs_c.reshape(3 * K)
    else:
        J = jnp.zeros((0, nq), dtype=dtype)
        b = jnp.zeros((0,), dtype=dtype)
        lo = jnp.zeros((0,), dtype=dtype)
        hi = jnp.zeros((0,), dtype=dtype)
        fscale = jnp.zeros((0,), dtype=dtype)

    if Ld:
        # Joint limit rows (JointLimitConstraint::update): lower limit
        # active when q <= lo (impulse >= 0 on +e_d); upper when q >= hi
        # (row −e_d with impulse >= 0 keeps all bounds [0, hi]).
        d_idx = jnp.asarray(Ld, dtype=jnp.int32)
        E = jax.nn.one_hot(d_idx, nq, dtype=dtype)    # (L, nq)
        v_star_L = E @ v_star                          # gather-free selection
        if planner:
            lo_act = jnp.ones(len(Ld), dtype)
            hi_act = jnp.ones(len(Ld), dtype)
        else:
            # E @ q, not q[d_idx]: the traced-operand gather is not
            # lane-evaluable (the fused class-rollout kernel runs this
            # NON-planner assembly); the model-parameter gathers below are
            # const-only and get hoisted out of kernels.
            q_L = E @ q
            lo_act = ((q_L - model.q_lower[d_idx]) <= 0.0).astype(dtype)
            hi_act = ((q_L - model.q_upper[d_idx]) >= 0.0).astype(dtype)
        J_lim = jnp.concatenate(
            [lo_act[:, None] * E, -hi_act[:, None] * E], axis=0
        )
        b_lim = jnp.concatenate(
            [-lo_act * v_star_L, hi_act * v_star_L]
        )
        hi_lim = jnp.concatenate([lo_act, hi_act]) * _BIG
        J = jnp.concatenate([J, J_lim], axis=0)
        b = jnp.concatenate([b, b_lim])
        lo = jnp.concatenate([lo, jnp.zeros(2 * len(Ld), dtype)])
        hi = jnp.concatenate([hi, hi_lim])
        fscale = jnp.concatenate([fscale, jnp.zeros(2 * len(Ld), dtype)])

    if model.servo_dofs:
        # Servo motors (ServoMotorConstraint): drive dof velocity to the
        # commanded value with impulse bounded by the dof force limits.
        s_idx = jnp.asarray(model.servo_dofs, dtype=jnp.int32)
        Es = jax.nn.one_hot(s_idx, nq, dtype=dtype)
        v_cmd = (
            servo_cmd
            if servo_cmd is not None
            else jnp.zeros(len(model.servo_dofs), dtype=dtype)
        )
        J = jnp.concatenate([J, Es], axis=0)
        b = jnp.concatenate([b, v_cmd - Es @ v_star])
        lo = jnp.concatenate([lo, model.tau_lower[s_idx] * model.dt])
        hi = jnp.concatenate([hi, model.tau_upper[s_idx] * model.dt])
        fscale = jnp.concatenate(
            [fscale, jnp.zeros(len(model.servo_dofs), dtype)]
        )

    if model.mimic:
        # Mimic motors (MimicMotorConstraint): dof velocity tracks
        # multiplier * reference dof velocity.
        rows_m, b_m = [], []
        for d, ref, mult, _off in model.mimic:
            e = jnp.zeros(nq, dtype=dtype).at[d].set(1.0).at[ref].add(-mult)
            rows_m.append(e)
            b_m.append(-(v_star[d] - mult * v_star[ref]))
        J = jnp.concatenate([J, jnp.stack(rows_m)], axis=0)
        b = jnp.concatenate([b, jnp.stack(b_m)])
        d_idx2 = jnp.asarray([m_[0] for m_ in model.mimic], dtype=jnp.int32)
        lo = jnp.concatenate([lo, model.tau_lower[d_idx2] * model.dt])
        hi = jnp.concatenate([hi, model.tau_upper[d_idx2] * model.dt])
        fscale = jnp.concatenate([fscale, jnp.zeros(len(model.mimic), dtype)])

    if model.loops:
        # Loop-closure dynamic joint constraints: bilateral rows
        # (lo=-inf, hi=+inf, findex=-1 — BallJointConstraint::getInformation,
        # BallJointConstraint.cpp:129-160; WeldJointConstraint.cpp:136-183).
        # Rows are expressed in WORLD axes (equivalent to the reference's
        # body1-frame rows for an equality constraint); violation is
        # ERP-stabilized: post-step J v' = -(erp/dt) * violation.
        from nimblephysics_tpu.ops import lie

        Jw_l = dyn.world_jacobian(model, kin) if K == 0 else Jw
        rows_l, b_l = [], []
        erp_over_dt = ERP / model.dt
        for li, (kind, ba, bb) in enumerate(model.loops):
            Ta = kin.T_wb[ba]
            pa = Ta.R @ model.loop_anchor_a[li] + Ta.p
            Jpt_a = Jw_l[ba][3:, :] + jnp.cross(
                Jw_l[ba][:3, :], pa[:, None], axis=0
            )
            if bb >= 0:
                Tb = kin.T_wb[bb]
                pb = Tb.R @ model.loop_anchor_b[li] + Tb.p
                Jpt_b = Jw_l[bb][3:, :] + jnp.cross(
                    Jw_l[bb][:3, :], pb[:, None], axis=0
                )
                Rb = Tb.R
                Jang_b = Jw_l[bb][:3, :]
            else:
                pb = model.loop_anchor_b[li]
                Jpt_b = jnp.zeros((3, nq), dtype=dtype)
                Rb = jnp.eye(3, dtype=dtype)
                Jang_b = jnp.zeros((3, nq), dtype=dtype)
            J_pos = Jpt_a - Jpt_b                      # (3, nq)
            viol_pos = pa - pb
            rows_l.append(J_pos)
            b_l.append(-(J_pos @ v_star) - erp_over_dt * viol_pos)
            if kind == "weld":
                J_rot = Jw_l[ba][:3, :] - Jang_b       # world angular rows
                R_err = Ta.R @ model.loop_rel_rot[li] @ Rb.T
                viol_rot = lie.logm_so3(R_err)
                rows_l.append(J_rot)
                b_l.append(-(J_rot @ v_star) - erp_over_dt * viol_rot)
        n_loop = loop_rows(model)
        J = jnp.concatenate([J] + rows_l, axis=0)
        b = jnp.concatenate([b] + b_l)
        lo = jnp.concatenate([lo, jnp.full((n_loop,), -_BIG, dtype)])
        hi = jnp.concatenate([hi, jnp.full((n_loop,), _BIG, dtype)])
        fscale = jnp.concatenate([fscale, jnp.zeros(n_loop, dtype)])

    Cd = coulomb_dofs(model)
    if Cd:
        # Joint Coulomb friction (JointCoulombFrictionConstraint): boxed
        # impulse |x| <= mu_c * dt resisting dof velocity.
        c_idx = jnp.asarray(Cd, dtype=jnp.int32)
        Ec = jax.nn.one_hot(c_idx, nq, dtype=dtype)
        f_imp = model.coulomb_friction[c_idx] * model.dt
        J = jnp.concatenate([J, Ec], axis=0)
        b = jnp.concatenate([b, -(Ec @ v_star)])
        lo = jnp.concatenate([lo, -f_imp])
        hi = jnp.concatenate([hi, f_imp])
        fscale = jnp.concatenate([fscale, jnp.zeros(len(Cd), dtype)])

    M = dyn.mass_matrix(model, q, kin=kin)
    if spd_solve is None:
        spd_solve = planner and nq <= 40
    if spd_solve:
        # pivot-free unrolled SPD solve: keeps the planner assembly free of
        # the serial pivoting loops jnp.linalg.solve lowers to on TPU (the
        # `lu` primitive is also not lane-evaluable — Atlas-study wall #3).
        # Mass matrices are SPD with bounded conditioning, so pivot-free
        # elimination is stable well past the old nq<=16 cap; 40 covers
        # Atlas (33) and drchubo-class humanoids.
        from nimblephysics_tpu.ops import linalg_small

        Minv_Jt = linalg_small.solve_spd(M, J.T)
    else:
        Minv_Jt = jnp.linalg.solve(M, J.T)      # (nq, m)
    m_total = J.shape[0]
    A = J @ Minv_Jt + CFM * jnp.eye(m_total, dtype=dtype)
    return J, A, b, lo, hi, fscale, Minv_Jt


def contact_step(
    model: Model,
    state: State,
    tau: jax.Array,
    x_warm: Optional[jax.Array] = None,
    lcp_iters: Optional[int] = None,
    return_info: bool = False,
    servo_cmd: Optional[jax.Array] = None,
    accuracy: str = "standard",
):
    """One differentiable constrained timestep. `servo_cmd` carries the
    velocity commands for `model.servo_dofs` (SERVO actuator type).

    `accuracy`:
      * "standard" — fixed-sweep PGS / direct active-set (the MPC hot path)
      * "staged"   — residual-gated fallback cascade (deeper sweeps, then
        frictionless restart; BoxedLcpConstraintSolver.cpp:390-470)
      * "hyper"    — the reference's makeHyperAccurateAndVerySlow
        (BoxedLcpConstraintSolver.hpp:94): staged cascade at ~40x sweep
        depth; use for golden-data generation and accuracy studies
    """
    q, v = state.q, state.v
    kin0 = dyn.forward_kinematics(model, q)
    qdd = dyn.aba(model, q, v, tau, kin=kin0)
    v_star = v + model.dt * qdd

    m = lcp_dim(model)
    if m == 0:
        q_next = step_mod.integrate_positions(model, q, v)
        return (State(q_next, v_star), None) if return_info else State(q_next, v_star)
    if accuracy == "hyper":
        method = "staged"
        lcp_iters = 2500 if lcp_iters is None else lcp_iters
    elif accuracy == "staged":
        method = "staged"
        lcp_iters = 60 if lcp_iters is None else lcp_iters
    elif total_slots(model) > 0:
        method = "gs"               # frictional contact: Gauss-Seidel depth
        lcp_iters = 60 if lcp_iters is None else lcp_iters
    else:
        # limit/Coulomb-only LCPs (no friction coupling): direct active-set
        # solve — a few masked matrix solves, the reference's warm-start
        # short-circuit structure (BoxedLcpConstraintSolver.cpp:422-458)
        method = "direct"
        lcp_iters = 3 if lcp_iters is None else lcp_iters

    contacts = detect_contacts(model, kin0.T_wb)
    J, A, b, lo, hi, fscale, Minv_Jt = build_constraint_system(
        model, q, v_star, kin0, contacts, servo_cmd
    )
    if x_warm is None:
        x_warm = jnp.zeros(m, dtype=q.dtype)
    x = lcp_mod.boxed_lcp(
        A, b, lo, hi, fscale, x_warm, lcp_findex(model), lcp_iters, method
    )

    v_next = v_star + Minv_Jt @ x
    q_next = step_mod.integrate_positions(model, q, v)
    out = State(q_next, v_next)
    if return_info:
        clamping, upper, s = lcp_mod._classify(
            x, lo, hi, fscale, lcp_findex(model)
        )
        resid = lcp_mod.lcp_residual(
            A, x, b, lo, hi, fscale, lcp_findex(model)
        )
        return out, ContactSolveInfo(
            impulses=x, contacts=contacts, J=J, v_star=v_star,
            clamping=clamping, upper=upper, upper_sign=s,
            residual=jax.lax.stop_gradient(resid),
        )
    return out


# ---------------------------------------------------------------------------
# Loop-closure constraint construction (the reference's dynamic joint
# constraints: ConstraintSolver::addConstraint(BallJointConstraintPtr),
# BallJointConstraint.cpp:43-92, WeldJointConstraint.cpp:41-90).
# ---------------------------------------------------------------------------

def add_ball_constraint(
    model: Model, q, body_a: int, body_b: int, world_point
) -> Model:
    """Close a kinematic loop: pin `world_point` (computed at configuration
    `q`) on body_a to the same material point on body_b (or to the world if
    body_b < 0). Returns a new Model with the constraint installed as 3
    bilateral LCP rows (BallJointConstraint.cpp:43: anchors are stored in
    each body's local frame at creation time)."""
    import numpy as np

    kin = dyn.forward_kinematics(model, jnp.asarray(q))
    p_w = jnp.asarray(world_point, dtype=model.mass.dtype)
    Ta = kin.T_wb[body_a]
    anchor_a = Ta.R.T @ (p_w - Ta.p)
    if body_b >= 0:
        Tb = kin.T_wb[body_b]
        anchor_b = Tb.R.T @ (p_w - Tb.p)
    else:
        anchor_b = p_w
    return _append_loop(model, ("ball", body_a, body_b), anchor_a, anchor_b,
                        jnp.eye(3, dtype=model.mass.dtype))


def add_weld_constraint(model: Model, q, body_a: int, body_b: int) -> Model:
    """Weld body_a to body_b (or the world if body_b < 0) at their current
    relative transform under configuration `q`
    (WeldJointConstraint.cpp:41-66: mRelativeTransform captured at
    creation). 6 bilateral LCP rows: 3 positional (anchored at body_a's
    origin) + 3 rotational with so3-log orientation stabilization."""
    kin = dyn.forward_kinematics(model, jnp.asarray(q))
    Ta = kin.T_wb[body_a]
    anchor_a = jnp.zeros(3, dtype=model.mass.dtype)  # body_a origin
    if body_b >= 0:
        Tb = kin.T_wb[body_b]
        anchor_b = Tb.R.T @ (Ta.p - Tb.p)
        rel_rot = Ta.R.T @ Tb.R
    else:
        anchor_b = Ta.p
        rel_rot = Ta.R.T
    return _append_loop(model, ("weld", body_a, body_b), anchor_a, anchor_b,
                        rel_rot)


def _append_loop(model: Model, spec, anchor_a, anchor_b, rel_rot) -> Model:
    stackers = (
        (model.loop_anchor_a, anchor_a),
        (model.loop_anchor_b, anchor_b),
        (model.loop_rel_rot, rel_rot),
    )
    new = []
    for prev, add in stackers:
        add = add[None]
        new.append(add if prev is None else jnp.concatenate([prev, add]))
    return model.replace(
        loops=model.loops + (spec,),
        loop_anchor_a=new[0],
        loop_anchor_b=new[1],
        loop_rel_rot=new[2],
    )

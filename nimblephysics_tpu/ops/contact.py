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


def lcp_dim(model: Model) -> int:
    return 3 * total_slots(model) + 2 * len(limited_dofs(model))


def lcp_findex(model: Model) -> Tuple[int, ...]:
    """Static friction-coupling index per LCP row."""
    fi = []
    for k in range(total_slots(model)):
        fi.extend([-1, 3 * k, 3 * k])
    fi.extend([-1] * (2 * len(limited_dofs(model))))
    return tuple(fi)


def _tangent_basis(n: jax.Array):
    """ODE-style tangent basis (ContactConstraint::getTangentBasisMatrixODE):
    first frictional direction is +Z with X fallback, made branch-free."""
    z = jnp.asarray([0.0, 0.0, 1.0], dtype=n.dtype)
    x = jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype)
    t_z = jnp.cross(z, n)
    t_x = jnp.cross(x, n)
    use_z = jnp.sum(t_z * t_z) > 1e-12
    t = jnp.where(use_z, t_z, t_x)
    t = t / jnp.sqrt(jnp.maximum(jnp.sum(t * t), 1e-18))
    t2 = jnp.cross(n, t)
    return t, t2


class ContactSolveInfo(NamedTuple):
    """Post-step constraint diagnostics (the BackpropSnapshot's recorded
    quantities, exposed for tests and warm starting)."""

    impulses: jax.Array       # (m,) LCP solution
    contacts: ContactSlots
    J: jax.Array              # (m, nq) constraint Jacobian
    v_star: jax.Array         # pre-constraint velocity


def build_constraint_system(
    model: Model,
    q: jax.Array,
    v_star: jax.Array,
    kin,
    contacts: ContactSlots,
):
    """Assemble J, A, b, bounds for the padded boxed LCP."""
    nq = model.nq
    dtype = q.dtype
    K = len(contacts.body_a)
    Ld = limited_dofs(model)
    m = 3 * K + 2 * len(Ld)

    Jw = dyn.world_jacobian(model, kin)  # (nb, 6, nq)

    rows = []
    b_rows = []
    lo_rows = []
    hi_rows = []
    fscale_rows = []

    inv_dt = 1.0 / model.dt

    for k in range(K):
        n = contacts.normal[k]
        p = contacts.point[k]
        active = contacts.active[k]
        act = active.astype(dtype)
        t1, t2 = _tangent_basis(n)

        def point_jac(b_idx):
            if b_idx < 0:
                return jnp.zeros((3, nq), dtype=dtype)
            Jb = Jw[b_idx]
            return Jb[3:] + jnp.cross(Jb[:3], p[:, None], axis=0)

        Jp = point_jac(contacts.body_a[k]) - point_jac(contacts.body_b[k])
        for d in (n, t1, t2):
            rows.append(act * (d @ Jp))

        # b: −(relative velocity along dirs) + bounce on the normal row.
        e = contacts.restitution[k]
        # restitution bounce (ContactConstraint::getInformation B.)
        neg_vn = -(rows[-3] @ v_star)
        restitution_vel = jnp.where(
            e > RESTITUTION_THRESHOLD, neg_vn * e, 0.0
        )
        bounce = jnp.where(
            restitution_vel > BOUNCING_VELOCITY_THRESHOLD,
            jnp.minimum(restitution_vel, MAX_BOUNCING_VELOCITY),
            0.0,
        )
        b_rows.append(act * (neg_vn + bounce))
        b_rows.append(act * -(rows[-2] @ v_star))
        b_rows.append(act * -(rows[-1] @ v_star))

        lo_rows.extend([jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype)])
        hi_rows.extend(
            [act * _BIG, jnp.zeros((), dtype), jnp.zeros((), dtype)]
        )
        mu = contacts.friction[k]
        fscale_rows.extend([jnp.zeros((), dtype), act * mu, act * mu])

    # Joint limit rows (JointLimitConstraint::update): lower limit active when
    # q <= lo (impulse >= 0 on +e_d); upper when q >= hi (impulse <= 0 ... we
    # use row −e_d with impulse >= 0 instead to keep all bounds [0, hi]).
    for d in Ld:
        e_d = jnp.zeros(nq, dtype=dtype).at[d].set(1.0)
        lo_violated = (q[d] - model.q_lower[d]) <= 0.0
        act = lo_violated.astype(dtype)
        rows.append(act * e_d)
        b_rows.append(act * -v_star[d])
        lo_rows.append(jnp.zeros((), dtype))
        hi_rows.append(act * _BIG)
        fscale_rows.append(jnp.zeros((), dtype))

        hi_violated = (q[d] - model.q_upper[d]) >= 0.0
        act = hi_violated.astype(dtype)
        rows.append(act * -e_d)
        b_rows.append(act * v_star[d])
        lo_rows.append(jnp.zeros((), dtype))
        hi_rows.append(act * _BIG)
        fscale_rows.append(jnp.zeros((), dtype))

    J = jnp.stack(rows) if rows else jnp.zeros((0, nq), dtype=dtype)
    b = jnp.stack(b_rows) if b_rows else jnp.zeros((0,), dtype=dtype)
    lo = jnp.stack(lo_rows) if lo_rows else jnp.zeros((0,), dtype=dtype)
    hi = jnp.stack(hi_rows) if hi_rows else jnp.zeros((0,), dtype=dtype)
    fscale = jnp.stack(fscale_rows) if fscale_rows else jnp.zeros((0,), dtype=dtype)

    M = dyn.mass_matrix(model, q)
    Minv_Jt = jnp.linalg.solve(M, J.T)          # (nq, m)
    A = J @ Minv_Jt + CFM * jnp.eye(m, dtype=dtype)
    return J, A, b, lo, hi, fscale, Minv_Jt


def contact_step(
    model: Model,
    state: State,
    tau: jax.Array,
    x_warm: Optional[jax.Array] = None,
    lcp_iters: int = 60,
    return_info: bool = False,
):
    """One differentiable constrained timestep."""
    q, v = state.q, state.v
    qdd = dyn.aba(model, q, v, tau)
    v_star = v + model.dt * qdd

    m = lcp_dim(model)
    if m == 0:
        q_next = step_mod.integrate_positions(model, q, v)
        return (State(q_next, v_star), None) if return_info else State(q_next, v_star)

    kin = dyn.forward_kinematics(model, q)
    contacts = detect_contacts(model, kin.T_wb)
    J, A, b, lo, hi, fscale, Minv_Jt = build_constraint_system(
        model, q, v_star, kin, contacts
    )
    if x_warm is None:
        x_warm = jnp.zeros(m, dtype=q.dtype)
    x = lcp_mod.boxed_lcp(A, b, lo, hi, fscale, x_warm, lcp_findex(model), lcp_iters)

    v_next = v_star + Minv_Jt @ x
    q_next = step_mod.integrate_positions(model, q, v)
    out = State(q_next, v_next)
    if return_info:
        return out, ContactSolveInfo(impulses=x, contacts=contacts, J=J, v_star=v_star)
    return out

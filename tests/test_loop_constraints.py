"""Loop-closure dynamic joint constraints (ball/weld).

Mirrors the reference's BallJointConstraint / WeldJointConstraint
(dart/constraint/BallJointConstraint.hpp:46, WeldJointConstraint.hpp:46)
and test_Constraint.cpp: a closed kinematic chain must hold the loop shut
through dynamics, and gradients through the bilateral rows must match
finite differences (the repo's FD-twin standard, utils/fd.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.contact import (
    add_ball_constraint,
    add_weld_constraint,
    contact_step,
    lcp_dim,
)
from nimblephysics_tpu.simulation.step import rollout
from nimblephysics_tpu.utils.fd import fd_grad


def _tip_world(model, q, body, local_p):
    kin = dyn.forward_kinematics(model, q)
    T = kin.T_wb[body]
    return T.R @ jnp.asarray(local_p, q.dtype) + T.p


def test_ball_constraint_holds_four_bar_loop():
    """3-link pendulum with its tip pinned back to the world: a four-bar
    linkage. Under gravity the loop point must stay put while the chain
    still swings (1 residual dof)."""
    model = builders.pendulum(n_links=3, dt=0.005)
    # bent configuration: a straight chain pinned at its tip is a locked
    # (degenerate) linkage; bending gives the four-bar its swing dof
    q0 = jnp.asarray([0.6, -1.2, 0.6])
    tip_local = jnp.asarray([0.0, -1.0, 0.0])
    pin_w = _tip_world(model, q0, 2, tip_local)
    model = add_ball_constraint(model, q0, 2, -1, pin_w)
    assert lcp_dim(model) == 3

    state = State(q=q0, v=jnp.zeros(3))
    T = 200
    acts = 0.5 * jnp.ones((T, model.num_actions))
    _, traj = rollout(model, state, acts)
    drift = []
    for t in range(0, T, 25):
        q_t = traj.q[t]
        drift.append(np.linalg.norm(np.asarray(
            _tip_world(model, q_t, 2, tip_local) - pin_w)))
    drift = np.asarray(drift)
    assert np.isfinite(np.asarray(traj.q)).all()
    # ERP-stabilized bilateral rows: the velocity-level constraint is exact,
    # so position drift accumulates only via Nimble's pre-step-velocity
    # integration and is pulled back at rate ERP/dt — bounded at the cm
    # scale over 1 s of continuous forcing (link length 1 m)
    assert drift.max() < 3e-2, drift
    # and the chain did actually move (the constraint isn't freezing it)
    assert np.abs(np.asarray(traj.q) - np.asarray(q0)).max() > 1e-2


def test_weld_constraint_freezes_relative_motion():
    """Weld the 2nd link of a double pendulum to the world: only link 1's
    dof should effectively remain, and the welded body's world pose must
    hold."""
    model = builders.pendulum(n_links=2, dt=0.005)
    q0 = jnp.asarray([0.3, -0.4])
    model = add_weld_constraint(model, q0, 1, -1)
    assert lcp_dim(model) == 6

    kin0 = dyn.forward_kinematics(model, q0)
    p0 = np.asarray(kin0.T_wb[1].p)
    R0 = np.asarray(kin0.T_wb[1].R)

    state = State(q=q0, v=jnp.zeros(2))
    acts = jnp.zeros((150, model.num_actions))
    _, traj = rollout(model, state, acts)
    qT = traj.q[-1]
    kinT = dyn.forward_kinematics(model, qT)
    assert np.allclose(np.asarray(kinT.T_wb[1].p), p0, atol=5e-3)
    assert np.allclose(np.asarray(kinT.T_wb[1].R), R0, atol=5e-3)
    assert np.isfinite(np.asarray(traj.q)).all()


def test_ball_constraint_gradients_fd_twin():
    """Gradients through the bilateral loop rows (implicit LCP rule) match
    finite differences — the repo's FD-twin requirement."""
    model = builders.pendulum(n_links=3, dt=0.005)
    q0 = jnp.asarray([0.6, -1.2, 0.6])
    tip_local = jnp.asarray([0.0, -1.0, 0.0])
    pin_w = _tip_world(model, q0, 2, tip_local)
    model = add_ball_constraint(model, q0, 2, -1, pin_w)

    def loss(u):
        state = State(q=q0, v=jnp.zeros(3))
        final, _ = rollout(model, state, u.reshape(10, model.num_actions))
        return jnp.sum(final.q**2) + 0.1 * jnp.sum(final.v**2)

    u0 = 0.3 * np.ones(10 * model.num_actions)
    g_ad = np.asarray(jax.grad(lambda u: loss(u))(jnp.asarray(u0)))
    g_fd = fd_grad(lambda u: float(loss(jnp.asarray(u))), u0, eps=1e-6)
    assert np.allclose(g_ad, g_fd, rtol=2e-4, atol=1e-7), (g_ad, g_fd)


def test_ball_constraint_anchor_gradients():
    """The anchor points are differentiable leaves: d(loss)/d(anchor) is
    finite and matches FD (WithRespectTo-style parameter gradients)."""
    model = builders.pendulum(n_links=2, dt=0.005)
    q0 = jnp.zeros(2)
    pin_w = _tip_world(model, q0, 1, jnp.asarray([0.0, -1.0, 0.0]))
    model = add_ball_constraint(model, q0, 1, -1, pin_w)

    def loss_from_anchor(a):
        m2 = model.replace(loop_anchor_b=jnp.asarray(a).reshape(1, 3))
        final, _ = rollout(
            m2, State(q=q0, v=jnp.zeros(2)), jnp.zeros((8, m2.num_actions))
        )
        return jnp.sum(final.q**2)

    a0 = np.asarray(pin_w).ravel()
    g_ad = np.asarray(jax.grad(loss_from_anchor)(jnp.asarray(a0)))
    g_fd = fd_grad(lambda a: float(loss_from_anchor(a)), a0, eps=1e-6)
    assert np.all(np.isfinite(g_ad))
    assert np.allclose(g_ad, g_fd, rtol=2e-4, atol=1e-7), (g_ad, g_fd)

"""Step-Jacobian oracles vs FD (the BackpropSnapshot contract) + mappings/IK."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.neural import IKMapping, backprop_state, ik_solve, step_jacobians
from nimblephysics_tpu.utils.fd import fd_jacobian


def test_step_jacobians_match_fd_cartpole():
    model = builders.cartpole(dt=0.02)
    s = State(q=jnp.asarray([0.1, 0.3]), v=jnp.asarray([-0.2, 0.4]))
    a = jnp.asarray([0.7])
    J = step_jacobians(model, s, a)

    from nimblephysics_tpu.simulation.step import step

    def fq(q):
        out = step(model, State(jnp.asarray(q), s.v), a)
        return np.concatenate([np.asarray(out.q), np.asarray(out.v)])

    J_fd = fd_jacobian(fq, np.asarray(s.q), eps=1e-7)
    np.testing.assert_allclose(np.asarray(J.pos_pos), J_fd[:2], atol=1e-7)
    np.testing.assert_allclose(np.asarray(J.pos_vel), J_fd[2:], atol=1e-6)

    def fv(v):
        out = step(model, State(s.q, jnp.asarray(v)), a)
        return np.concatenate([np.asarray(out.q), np.asarray(out.v)])

    J_fd = fd_jacobian(fv, np.asarray(s.v), eps=1e-7)
    np.testing.assert_allclose(np.asarray(J.vel_pos), J_fd[:2], atol=1e-7)
    np.testing.assert_allclose(np.asarray(J.vel_vel), J_fd[2:], atol=1e-6)

    # velPos is exactly dt * I under Nimble's parallel updates
    np.testing.assert_allclose(
        np.asarray(J.vel_pos), 0.02 * np.eye(2), atol=1e-12
    )

    def fm(mass):
        m2 = model.replace(mass=jnp.asarray(mass))
        out = step(m2, s, a)
        return np.asarray(out.v)

    J_fd = fd_jacobian(fm, np.asarray(model.mass), eps=1e-6)
    np.testing.assert_allclose(np.asarray(J.mass_vel), J_fd, atol=1e-5)


def test_step_jacobians_through_contact():
    """The six Jacobians stay FD-correct with an ACTIVE contact (jump_worm
    resting on the floor) — the reference's entire reason to exist."""
    from nimblephysics_tpu.simulation.step import rollout, step

    model = builders.jump_worm(dt=0.002)
    s_air = State(q=jnp.zeros(model.nq).at[2].set(1.2).at[3].set(1.2),
                  v=jnp.zeros(model.nq))
    s0, _ = rollout(model, s_air, jnp.zeros((400, 2)))
    s0 = State(s0.q, s0.v.at[2].set(1.0))
    a = jnp.asarray([5.0, -3.0])
    J = step_jacobians(model, s0, a)

    def fv(v):
        out = step(model, State(s0.q, jnp.asarray(v)), a)
        return np.asarray(out.v)

    J_fd = fd_jacobian(fv, np.asarray(s0.v), eps=1e-7)
    np.testing.assert_allclose(np.asarray(J.vel_vel), J_fd, atol=5e-5)


def test_backprop_state_matches_vjp_fd():
    model = builders.cartpole(dt=0.02)
    s = State(q=jnp.asarray([0.05, -0.2]), v=jnp.asarray([0.3, 0.1]))
    a = jnp.asarray([1.5])
    g = jnp.asarray([1.0, -2.0, 0.5, 0.25])
    gx, ga = backprop_state(model, s, a, g)

    from nimblephysics_tpu.simulation.step import step

    def f(x):
        out = step(model, State.from_flat(jnp.asarray(x)), a)
        return np.asarray(out.flat())

    J_fd = fd_jacobian(f, np.asarray(s.flat()), eps=1e-7)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g) @ J_fd, atol=1e-6)


def test_ik_mapping_roundtrip():
    model = builders.pendulum(3)
    mapping = IKMapping(model=model, entries=(("linear", 2), ("com", -1)))
    q = jnp.asarray([0.3, -0.5, 0.8])
    out = mapping.map_positions(q)
    assert out.shape == (6,)
    # velocity map = J @ v
    v = jnp.asarray([0.1, 0.2, -0.3])
    Jv = mapping.jacobian(q) @ v
    np.testing.assert_allclose(
        np.asarray(mapping.map_velocities(q, v)), np.asarray(Jv), atol=1e-10
    )
    # IK: recover q that reaches the target end-effector position
    target = mapping.map_positions(jnp.asarray([0.5, -0.2, 0.4]))
    q_sol = mapping.inverse_positions(target, jnp.zeros(3), iters=100)
    np.testing.assert_allclose(
        np.asarray(mapping.map_positions(q_sol)), np.asarray(target), atol=1e-5
    )


def test_ik_solve_reaches_point():
    """Plain task-space IK on the KR5-class chain (math::IKSolver analog)."""
    model = builders.pendulum(4)
    from nimblephysics_tpu.neural.mappings import marker_positions

    markers = [(3, jnp.asarray([0.0, -1.0, 0.0]))]

    def tip(q):
        return marker_positions(model, q, markers)[0]

    q_true = jnp.asarray([0.4, 0.3, -0.6, 0.2])
    target = tip(q_true)
    q_sol = ik_solve(tip, target, jnp.zeros(4), iters=200)
    np.testing.assert_allclose(np.asarray(tip(q_sol)), np.asarray(target), atol=1e-4)

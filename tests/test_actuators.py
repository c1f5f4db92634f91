"""Servo & mimic motor constraints + Coulomb joint friction + raycasts."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State, build_model
from nimblephysics_tpu.ops.contact import contact_step
from nimblephysics_tpu.ops.raycast import raycast
from nimblephysics_tpu.simulation.step import rollout


def _arm(servo=(), mimic=(), coulomb=0.0):
    joints = [
        dict(type="revolute", name="j0", body_name="b0", parent=-1,
             axes=[[0, 0, 1.0]], mass=1.0, com=[0.0, -0.5, 0.0],
             moment=np.eye(3) * 0.02, coulomb_friction=coulomb),
        dict(type="revolute", name="j1", body_name="b1", parent=0,
             axes=[[0, 0, 1.0]], T_pj=None, mass=1.0, com=[0.0, -0.5, 0.0],
             moment=np.eye(3) * 0.02, coulomb_friction=coulomb,
             tau_lower=-50.0, tau_upper=50.0),
    ]
    from nimblephysics_tpu.ops.lie import Transform

    joints[1]["T_pj"] = Transform(np.eye(3), np.asarray([0.0, -1.0, 0.0]))
    m = build_model(joints, dt=0.005, gravity=(0.0, 0.0, 0.0))
    return m.replace(servo_dofs=tuple(servo), mimic=tuple(mimic))


def test_servo_tracks_velocity_command():
    model = _arm(servo=(1,))
    s = State(q=jnp.zeros(2), v=jnp.zeros(2))
    for _ in range(20):
        s = contact_step(model, s, jnp.zeros(2), servo_cmd=jnp.asarray([1.5]))
    assert abs(float(s.v[1]) - 1.5) < 1e-3, float(s.v[1])


def test_servo_respects_force_limit():
    """A heavy load + weak force limit: the servo can't reach the command
    instantly (impulse saturates at tau_limit * dt)."""
    model = _arm(servo=(1,))
    model = model.replace(
        tau_lower=model.tau_lower.at[1].set(-0.5),
        tau_upper=model.tau_upper.at[1].set(0.5),
    )
    s = State(q=jnp.zeros(2), v=jnp.zeros(2))
    s2 = contact_step(model, s, jnp.zeros(2), servo_cmd=jnp.asarray([10.0]))
    # impulse cap: dv <= M^-1 * tau_max * dt, far below 10 rad/s in one step
    assert float(s2.v[1]) < 1.0


def test_mimic_couples_joints():
    model = _arm(mimic=((1, 0, 0.5, 0.0),))
    s = State(q=jnp.zeros(2), v=jnp.zeros(2))
    # drive joint 0 with torque; joint 1 must track half its velocity
    for _ in range(30):
        s = contact_step(model, s, jnp.asarray([2.0, 0.0]))
    v0, v1 = float(s.v[0]), float(s.v[1])
    assert abs(v1 - 0.5 * v0) < 1e-3 * max(1.0, abs(v0)), (v0, v1)


def test_coulomb_friction_holds_small_torque():
    """Static joint friction: small torques don't move the joint; larger
    torques overcome friction."""
    model = _arm(coulomb=2.0)
    s0 = State(q=jnp.zeros(2), v=jnp.zeros(2))
    s = s0
    for _ in range(20):
        s = contact_step(model, s, jnp.asarray([1.0, 0.0]))  # below friction
    assert abs(float(s.v[0])) < 1e-6, float(s.v[0])
    s = s0
    for _ in range(20):
        s = contact_step(model, s, jnp.asarray([10.0, 0.0]))  # above friction
    assert float(s.v[0]) > 0.05


def test_raycast_hits_shapes():
    model = builders.jump_worm()
    q = jnp.zeros(model.nq)
    # ray straight down through the worm root box at the origin
    res = raycast(model, q, jnp.asarray([0.0, 1.0, 0.0]),
                  jnp.asarray([0.0, -1.0, 0.0]))
    assert bool(res.hit)
    # box half extent 0.05: first hit at y=0.05 -> fraction (1-0.05)/2
    np.testing.assert_allclose(float(res.fraction), (1.0 - 0.05) / 2.0,
                               atol=1e-6)
    # ray that misses everything (note: the floor halfspace is infinite, so
    # aim upward)
    res2 = raycast(model, q, jnp.asarray([5.0, 1.0, 0.0]),
                   jnp.asarray([5.0, 2.0, 0.0]))
    assert not bool(res2.hit)

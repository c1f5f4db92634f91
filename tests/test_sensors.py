"""IMU simulation vs finite differences and physical ground truth
(test_Sensors.cpp / test_DifferentiableIMUs.cpp analog)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import build_model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.lie import Transform, expm_so3
from nimblephysics_tpu.ops.sensors import (
    accelerometer_jacobians,
    accelerometer_readings,
    gyro_jacobians,
    gyro_readings,
    magnetometer_readings,
)
from nimblephysics_tpu.utils.fd import fd_jacobian


def _sensor():
    return Transform(
        np.asarray(expm_so3(jnp.asarray([0.1, -0.2, 0.3]))),
        np.asarray([0.05, -0.1, 0.02]),
    )


def test_accelerometer_at_rest_reads_gravity():
    """A stationary IMU must read −g expressed in the sensor frame
    (i.e. +9.81 'up' in sensor coordinates)."""
    model = builders.pendulum(2)
    sensors = [(1, Transform(np.eye(3), np.asarray([0.0, -0.5, 0.0])))]
    q = jnp.zeros(2)
    v = jnp.zeros(2)
    # at rest only if qdd = 0: hold with gravity-compensating torques
    qdd = jnp.zeros(2)
    acc = np.asarray(accelerometer_readings(model, q, v, qdd, sensors))
    np.testing.assert_allclose(acc[0], [0.0, 9.81, 0.0], atol=1e-12)


def test_gyro_matches_fd_and_spin():
    """Free body spinning about z: gyro reads omega in the body frame."""
    m = build_model([dict(type="free", name="f", body_name="b", parent=-1,
                          mass=1.0)])
    sensors = [(0, _sensor())]
    q = jnp.asarray([0.2, -0.1, 0.4, 0.0, 0.0, 0.0])
    v = jnp.zeros(6).at[2].set(2.0)  # expmap-rate; omega = Jr(w) @ wdot
    g = np.asarray(gyro_readings(m, q, v, sensors))
    from nimblephysics_tpu.ops.lie import so3_right_jacobian

    omega_body = np.asarray(so3_right_jacobian(q[:3]) @ v[:3])
    R_s = np.asarray(sensors[0][1].R)
    np.testing.assert_allclose(g[0], R_s.T @ omega_body, atol=1e-10)


def test_imu_jacobians_match_fd():
    model = builders.pendulum(3)
    sensors = [(2, _sensor())]
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, 3))
    v = jnp.asarray(rng.standard_normal(3))
    qdd = jnp.asarray(rng.standard_normal(3))

    Jq, Jv = gyro_jacobians(model, q, v, sensors)
    J_fd = fd_jacobian(
        lambda qq: np.asarray(
            gyro_readings(model, jnp.asarray(qq), v, sensors)
        ).ravel(),
        np.asarray(q), eps=1e-7,
    )
    np.testing.assert_allclose(np.asarray(Jq).reshape(3, 3), J_fd, atol=1e-6)

    Aq, Av, Aa = accelerometer_jacobians(model, q, v, qdd, sensors)
    J_fd = fd_jacobian(
        lambda vv: np.asarray(
            accelerometer_readings(model, q, jnp.asarray(vv), qdd, sensors)
        ).ravel(),
        np.asarray(v), eps=1e-7,
    )
    np.testing.assert_allclose(np.asarray(Av).reshape(3, 3), J_fd, atol=1e-6)


def test_accelerometer_centripetal():
    """Pendulum swinging through the bottom: centripetal acceleration
    omega^2 * r points toward the pivot, plus gravity."""
    model = builders.pendulum(1)
    r = 1.0
    sensors = [(0, Transform(np.eye(3), np.asarray([0.0, -r, 0.0])))]
    omega = 3.0
    q = jnp.asarray([0.0])
    v = jnp.asarray([omega])
    qdd = dyn.aba(model, q, v, jnp.zeros(1))  # = 0 at the bottom
    acc = np.asarray(accelerometer_readings(model, q, v, qdd, sensors))
    # sensor frame == body frame: y up toward pivot
    np.testing.assert_allclose(
        acc[0], [0.0, omega**2 * r + 9.81, 0.0], atol=1e-9
    )


def test_magnetometer_rotates_field():
    m = build_model([dict(type="revolute", name="r", body_name="b", parent=-1,
                          axes=[[0, 0, 1.0]], mass=1.0)])
    sensors = [(0, Transform(np.eye(3), np.zeros(3)))]
    field = jnp.asarray([1.0, 0.0, 0.0])
    q = jnp.asarray([np.pi / 2])
    reading = np.asarray(magnetometer_readings(m, q, sensors, field))
    np.testing.assert_allclose(reading[0], [0.0, -1.0, 0.0], atol=1e-12)

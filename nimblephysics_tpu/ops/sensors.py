"""Differentiable sensor simulation — gyroscopes, accelerometers, magnetometers.

Maps the reference's IMU support (`Skeleton::getGyroReadings` /
`getAccelerometerReadings` with analytic Jacobians wrt q/dq/ddq,
Skeleton.hpp:1673-1726). A sensor is (body_index, offset Transform); all
readings are closed-form functions of (q, v, qdd) so every Jacobian the
reference hand-derives is one `jax.jacfwd` here.

Conventions: gyro = body-frame angular velocity at the sensor frame;
accelerometer = proper acceleration (linear acceleration at the sensor
point minus gravity) expressed in the sensor frame.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import lie
from nimblephysics_tpu.ops.lie import Transform

Sensor = Tuple[int, Transform]  # (body index, mount offset in body frame)


def _sensor_velocity(model: Model, q, v, sensors: Sequence[Sensor]):
    """Spatial velocity of each sensor frame, in the sensor frame."""
    kin = dyn.forward_kinematics(model, q)
    vel = dyn.velocity_kinematics(model, kin, q, v)
    out = []
    for b, off in sensors:
        V_s = lie.Ad_inv_apply(off, vel.V[b])
        out.append(V_s)
    return out


def gyro_readings(
    model: Model, q: jax.Array, v: jax.Array, sensors: Sequence[Sensor]
) -> jax.Array:
    """(n_sensors, 3) angular velocity in each sensor frame."""
    return jnp.stack(
        [V[:3] for V in _sensor_velocity(model, q, v, sensors)]
    )


def accelerometer_readings(
    model: Model,
    q: jax.Array,
    v: jax.Array,
    qdd: jax.Array,
    sensors: Sequence[Sensor],
) -> jax.Array:
    """(n_sensors, 3) proper acceleration in each sensor frame.

    Computed as d/dt of the sensor-point world velocity along the state
    flow (q̇=v, v̇=qdd) minus gravity, rotated into the sensor frame —
    the classical accelerometer model, exact via one jvp.
    """

    def point_vel_world(qv):
        qq, vv = qv[: model.nq], qv[model.nq:]
        kin = dyn.forward_kinematics(model, qq)
        vel = dyn.velocity_kinematics(model, kin, qq, vv)
        outs = []
        for b, off in sensors:
            # world-frame linear velocity of the sensor point
            V_b = vel.V[b]
            p_s = off.p
            v_point_body = V_b[3:] + jnp.cross(V_b[:3], p_s)
            outs.append(kin.T_wb[b].rotate(v_point_body))
        return jnp.stack(outs)

    qv = jnp.concatenate([q, v])
    dqv = jnp.concatenate([v, qdd])
    _, a_world = jax.jvp(point_vel_world, (qv,), (dqv,))

    kin = dyn.forward_kinematics(model, q)
    out = []
    for i, (b, off) in enumerate(sensors):
        R_ws = kin.T_wb[b].R @ off.R
        proper = a_world[i] - model.gravity.astype(q.dtype)
        out.append(R_ws.T @ proper)
    return jnp.stack(out)


def magnetometer_readings(
    model: Model, q: jax.Array, sensors: Sequence[Sensor],
    field_world: jax.Array,
) -> jax.Array:
    """(n_sensors, 3) world magnetic field expressed in each sensor frame."""
    kin = dyn.forward_kinematics(model, q)
    out = []
    for b, off in sensors:
        R_ws = kin.T_wb[b].R @ off.R
        out.append(R_ws.T @ field_world)
    return jnp.stack(out)


def gyro_jacobians(model, q, v, sensors):
    """d(gyro)/dq, d(gyro)/dv — the reference's analytic IMU Jacobians
    (Skeleton.hpp:1706) via forward-mode AD."""
    f = lambda qq, vv: gyro_readings(model, qq, vv, sensors)
    return jax.jacfwd(f, argnums=(0, 1))(q, v)


def accelerometer_jacobians(model, q, v, qdd, sensors):
    f = lambda qq, vv, aa: accelerometer_readings(model, qq, vv, aa, sensors)
    return jax.jacfwd(f, argnums=(0, 1, 2))(q, v, qdd)

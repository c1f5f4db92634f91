"""Saddle-point escape via alternate active-set classification.

Mirrors /root/reference/unittests/comprehensive/test_SaddlepointEscape.cpp
(BALL_ON_FIXED_GROUND): a 1-dof prismatic ball resting on the floor is
CLAMPING, so the correct gradient annihilates the control direction — an
optimizer that wants to lift the ball off the floor is stuck at a saddle.
`backprop_state(..., explore_alternate_strategies=True)` (the reference's
BackpropSnapshot::backprop explore flag,
ConstrainedGroupGradientMatrices.cpp:1947-2037) re-classifies the contact
from the loss's point of view and returns the larger-magnitude direction,
unblocking the torque gradient.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, ShapeSpec, State, build_model
from nimblephysics_tpu.neural.jacobians import backprop_state
from nimblephysics_tpu.ops.lie import Transform


def _ball_on_ground(dt=0.01):
    joints = [
        dict(
            type="prismatic", name="ball_y", body_name="ball", parent=-1,
            axes=[[0.0, 1.0, 0.0]], mass=1.0,
        ),
    ]
    shapes = (
        ShapeSpec(
            kind="sphere", body_index=0,
            offset=Transform(np.eye(3), np.zeros(3)),
            params=jnp.asarray([0.5, 0.0, 0.0, 0.0]),
            friction=jnp.asarray(0.0),
        ),
        ShapeSpec(
            kind="halfspace", body_index=-1,
            offset=Transform(np.eye(3), np.zeros(3)),
            params=jnp.asarray([0.0, 1.0, 0.0, 0.0]),
            friction=jnp.asarray(0.0),
        ),
    )
    return build_model(joints, dt=dt, shapes=shapes)


def test_explore_alternate_strategies_escapes_blocked_contact():
    model = _ball_on_ground()
    dt = float(model.dt)
    # resting ON the floor, closing slowly: the contact is clamping
    s = State(q=jnp.asarray([0.5 - 1e-4]), v=jnp.asarray([-1e-4]))
    a = jnp.zeros(model.num_actions)

    # loss wants the ball HIGHER: d(loss)/d(q') = -0.1
    g1 = jnp.asarray([-0.1, 0.0])
    gx, ga = backprop_state(model, s, a, g1)
    np.testing.assert_allclose(float(gx[0]), -0.1, rtol=1e-9)
    np.testing.assert_allclose(float(gx[1]), -0.1 * dt, rtol=1e-9)
    # the clamping contact annihilates the control direction
    np.testing.assert_allclose(np.asarray(ga), 0.0, atol=1e-8)

    # chain a second step: still blocked on the standard path
    g2 = jnp.concatenate([gx[:1], gx[1:]])
    gx_b, ga_b = backprop_state(model, s, a, g2)
    np.testing.assert_allclose(np.asarray(ga_b), 0.0, atol=1e-8)

    # explore flag: first call (zero velocity loss) stays the correct
    # gradient...
    gx_e1, ga_e1 = backprop_state(
        model, s, a, g1, explore_alternate_strategies=True
    )
    np.testing.assert_allclose(float(gx_e1[0]), -0.1, rtol=1e-9)
    np.testing.assert_allclose(float(gx_e1[1]), -0.1 * dt, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ga_e1), 0.0, atol=1e-8)

    # ...but the chained call re-classifies the contact as separating and
    # unblocks the torque direction (reference EXPECTs at
    # test_SaddlepointEscape.cpp:155-158: lossWrtVel = -0.2 dt,
    # lossWrtTorque = -0.1 dt^2)
    gx_e2, ga_e2 = backprop_state(
        model, s, a, g2, explore_alternate_strategies=True
    )
    np.testing.assert_allclose(float(gx_e2[1]), -0.2 * dt, rtol=1e-6)
    np.testing.assert_allclose(float(ga_e2[0]), -0.1 * dt * dt, rtol=1e-6)


def test_explore_strategies_is_jittable_and_keeps_correct_gradient_when_larger():
    """When the true gradient already has the larger magnitude, the explore
    flag must return it unchanged — and the whole path must jit."""
    model = _ball_on_ground()
    # ball in free fall above the floor: no active contact, gradients flow
    s = State(q=jnp.asarray([1.5]), v=jnp.asarray([0.0]))
    a = jnp.zeros(model.num_actions)
    g = jnp.asarray([-0.1, -0.3])

    f = jax.jit(
        lambda st, aa, gg: backprop_state(
            model, State.from_flat(st), aa, gg,
            explore_alternate_strategies=True,
        )
    )
    gx_e, ga_e = f(s.flat(), a, g)
    gx, ga = backprop_state(model, s, a, g)
    np.testing.assert_allclose(np.asarray(gx_e), np.asarray(gx), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ga_e), np.asarray(ga), rtol=1e-9)

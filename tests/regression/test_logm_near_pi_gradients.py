"""Regression: NaN gradients of logm_so3 near the pi-rotation branch cut.

Round-1 bug: `jax.grad` through `lie.logm_so3` returned NaN for rotations
with angle near pi (the catapult throw passes through such states), from
0/0 in the sin(theta) normalization. Fixed with a value floor + stable
branch; this repro pins it (reference analogue: the reference's
unit-quaternion guards in math/Geometry.cpp).
"""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.ops import lie


def test_logm_so3_gradients_finite_near_pi():
    for angle in (np.pi - 1e-4, np.pi - 1e-6, np.pi, np.pi + 1e-6):
        axis = jnp.asarray([0.3, -0.5, 0.81])
        axis = axis / jnp.linalg.norm(axis)

        def f(theta):
            R = lie.expm_so3(axis * theta)
            return jnp.sum(lie.logm_so3(R) ** 2)

        g = jax.grad(f)(jnp.asarray(angle))
        assert np.isfinite(float(g)), f"NaN grad at angle {angle}"

    # identity neighborhood too (the other degenerate point)
    g0 = jax.grad(lambda w: jnp.sum(lie.logm_so3(lie.expm_so3(w)) ** 2))(
        jnp.asarray([1e-9, -1e-9, 1e-9])
    )
    assert np.isfinite(np.asarray(g0)).all()

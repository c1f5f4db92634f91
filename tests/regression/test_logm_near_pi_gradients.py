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


def test_free_root_frozen_step_lane_evaluable_near_pi():
    """Round-5 closure of BIGMODEL_STUDY wall 2: the exp-map FREE-root
    frozen-contact step (whose position integrator round-trips through
    logm_so3) must be lane-evaluable — including at near-pi root
    orientations — and match the direct XLA evaluation. This puts
    free-root models on the fused planner path (the reference keeps both
    exp-map and Euler roots for a reason, math/Geometry.hpp:306-323)."""
    from nimblephysics_tpu.models.model import ShapeSpec, build_model
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.lanevmap import LaneFn
    from nimblephysics_tpu.ops.lie import Transform
    from nimblephysics_tpu.ops.pallas_linearize import dyn_frozen_for_trace

    joints = [dict(type="free", name="root", body_name="b", parent=-1,
                   mass=1.0, moment=np.eye(3) * 1e-3)]
    shapes = (
        ShapeSpec(kind="box", body_index=0,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([0.1, 0.1, 0.1, 0.0])),
        ShapeSpec(kind="halfspace", body_index=-1,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0])),
    )
    model = build_model(joints, dt=0.002, shapes=shapes, actuated=(3, 4, 5))
    m = lcp_dim(model)
    dynf = dyn_frozen_for_trace(model, cg_iters=8)
    z = lambda n: jnp.zeros(n)  # noqa: E731
    lf = LaneFn(lambda x, u, cm, us: dynf(x, u, cm, us),
                (z(12), z(3), z(m), z(m)))

    rng = np.random.default_rng(3)
    # lane batch of states including near-pi root orientations
    axis = np.asarray([0.3, -0.5, 0.81])
    axis = axis / np.linalg.norm(axis)
    qs = np.zeros((128, 6))
    qs[:, 4] = 0.11                      # just above the floor
    for i, ang in enumerate((np.pi - 1e-4, np.pi - 1e-2, 2.5, 0.1)):
        qs[i::8, :3] = axis * ang
    xs = np.concatenate([qs, 0.1 * rng.standard_normal((128, 6))], axis=1)
    us = 0.1 * rng.standard_normal((128, 3))
    cms = (rng.random((128, m)) > 0.5).astype(np.float64)

    def lanes(a):
        return jnp.asarray(a.T.reshape(a.shape[1], 1, 128))

    (out,) = lf.call(lf.consts2d,
                     [lanes(xs), lanes(us), lanes(cms),
                      lanes(np.zeros((128, m)))], (1, 128))
    ref = jax.vmap(dynf)(jnp.asarray(xs), jnp.asarray(us),
                         jnp.asarray(cms), jnp.zeros((128, m)))
    out_b = np.asarray(out).reshape(12, 128).T
    assert np.isfinite(out_b).all()
    np.testing.assert_allclose(out_b, np.asarray(ref), atol=2e-4)

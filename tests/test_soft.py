"""Soft bodies: mass-spring particle clouds + rigid coupling.

Reference subsystem: dart/dynamics/SoftBodyNode.* / PointMass.* (legacy,
explicitly NOT differentiated there) — here the whole module is
differentiable, which the tests exercise."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import ShapeSpec, State, build_model
from nimblephysics_tpu.ops.lie import Transform
from nimblephysics_tpu.simulation.soft import (
    CoupledState,
    coupled_step,
    init_soft_state,
    make_box_soft_body,
    soft_step,
)


def _floor_model(dt=0.002):
    joints = [dict(type="free", name="root", body_name="b", parent=-1,
                   mass=1.0, moment=np.eye(3) * 1e-3)]
    shapes = (
        ShapeSpec(kind="halfspace", body_index=-1,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0])),
    )
    return build_model(joints, dt=dt, shapes=shapes, actuated=())


def test_soft_cube_falls_and_rests_on_floor():
    model = _floor_model()
    soft = make_box_soft_body(size=(0.2, 0.2, 0.2), grid=(3, 3, 3),
                              total_mass=0.5)
    s0 = init_soft_state(soft, Transform(jnp.eye(3),
                                         jnp.asarray([0.0, 0.4, 0.0])))

    def run(s):
        def body(carry, _):
            return soft_step(model, soft, carry), None
        return jax.lax.scan(body, s, None, length=1500)[0]

    sf = jax.jit(run)(s0)
    y = np.asarray(sf.x[:, 1])
    vy = np.asarray(sf.v)
    assert y.min() > -0.05                    # not through the floor
    assert y.max() < 0.4                      # actually fell
    assert np.abs(vy).max() < 0.5             # settled
    # box roughly keeps its size (edge springs hold shape)
    ext = y.max() - y.min()
    assert 0.1 < ext < 0.35, ext


def test_soft_body_differentiable():
    """grad through 200 soft steps wrt spring stiffness must be finite —
    the capability the reference's soft bodies lack."""
    model = _floor_model()
    soft = make_box_soft_body(grid=(2, 2, 2), total_mass=0.3)
    s0 = init_soft_state(soft, Transform(jnp.eye(3),
                                         jnp.asarray([0.0, 0.15, 0.0])))

    def loss(ke):
        sb = jax.tree_util.tree_map(lambda x: x, soft)
        sb = type(soft)(**{**{f.name: getattr(soft, f.name)
                              for f in soft.__dataclass_fields__.values()},
                           "ke": ke})
        def body(carry, _):
            return soft_step(model, sb, carry), None
        sf = jax.lax.scan(body, s0, None, length=200)[0]
        return jnp.mean(sf.x[:, 1] ** 2)

    g = jax.grad(loss)(jnp.asarray(400.0))
    assert np.isfinite(float(g))


def test_coupled_soft_rigid_reaction():
    """A heavy soft pad anchored to a free body pulls the body down with
    it: total vertical momentum must evolve consistently (reaction forces
    present, opposite and through the anchor)."""
    model = _floor_model(dt=0.001)
    soft = make_box_soft_body(size=(0.15, 0.05, 0.15), grid=(3, 2, 3),
                              total_mass=2.0, anchor_body=0, kv=800.0,
                              damping=6.0)
    rigid0 = State(q=jnp.zeros(6).at[4].set(0.5), v=jnp.zeros(6))
    kin_T = Transform(jnp.eye(3), jnp.asarray([0.0, 0.5, 0.0]))
    cs0 = CoupledState(rigid=rigid0, soft=init_soft_state(soft, kin_T))

    def run(cs):
        def body(carry, _):
            return coupled_step(model, soft, carry, jnp.zeros(0)), None
        return jax.lax.scan(body, cs, None, length=400)[0]

    csf = jax.jit(run)(cs0)
    # both fell together; the pad stayed attached (near the body)
    y_rigid = float(csf.rigid.q[4])
    y_soft = float(jnp.mean(csf.soft.x[:, 1]))
    assert y_rigid < 0.5 and np.isfinite(y_rigid)
    assert abs(y_rigid - y_soft) < 0.25, (y_rigid, y_soft)

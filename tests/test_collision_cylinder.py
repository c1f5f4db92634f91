"""Cylinder / cone narrow phases (reference: DARTCollide.hpp:271-295,
collideCylinderSphere / collideCylinderPlane) — geometry unit checks plus
the settle tests that pin the physical behavior (a cylinder must rest
stably on a cap AND on its side; a capsule-aliased cylinder would roll)."""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import ShapeSpec, State, build_model
from nimblephysics_tpu.ops.collide import (
    _cone_halfspace,
    _cylinder_halfspace,
    _sphere_cone,
    _sphere_cylinder,
    detect_contacts,
    total_slots,
)
from nimblephysics_tpu.ops.contact import contact_step
from nimblephysics_tpu.ops.lie import Transform


def _T(p=(0, 0, 0), R=None):
    return Transform(
        jnp.asarray(np.eye(3) if R is None else R, dtype=jnp.float64),
        jnp.asarray(p, dtype=jnp.float64),
    )


def _rot_x(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[1, 0, 0], [0, c, -s], [0, s, c]])


FLOOR = jnp.asarray([0.0, 1.0, 0.0, 0.0])  # y=0 plane, solid below


def test_cylinder_on_side_contacts():
    """Cylinder (r=0.2, h=1) lying along x, center at y=0.15: line contact,
    the two deepest rim slots at depth 0.05, at the cap x = ±0.5."""
    pa = jnp.asarray([0.2, 1.0, 0.0, 0.0])
    # axis local z -> world x: rotate z onto x
    R = np.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    pts, ns, ds = _cylinder_halfspace(pa, FLOOR, _T((0, 0.15, 0), R), _T())
    ds = np.asarray(jnp.stack(ds))
    pts = np.asarray(jnp.stack(pts))
    deepest = np.sort(ds)[-2:]
    np.testing.assert_allclose(deepest, 0.05, atol=1e-12)
    # the two deepest points are at the bottom of each cap
    idx = np.argsort(ds)[-2:]
    np.testing.assert_allclose(sorted(np.abs(pts[idx][:, 0])), [0.5, 0.5],
                               atol=1e-12)
    np.testing.assert_allclose(pts[idx][:, 1], -0.05, atol=1e-12)


def test_cylinder_on_cap_contacts():
    """Cylinder standing on a cap (axis = y), base at y=-0.02: the 4 rim
    slots of the lower cap all at equal depth (stable ring)."""
    pa = jnp.asarray([0.2, 1.0, 0.0, 0.0])
    R = _rot_x(-np.pi / 2)  # local z -> world y
    pts, ns, ds = _cylinder_halfspace(pa, FLOOR, _T((0, 0.48, 0), R), _T())
    ds = np.asarray(jnp.stack(ds))
    active = np.sort(ds)[-4:]
    np.testing.assert_allclose(active, 0.02, atol=1e-12)


def test_sphere_cylinder_side_and_cap():
    pa = jnp.asarray([0.1, 0.0, 0.0, 0.0])        # sphere r=0.1
    pb = jnp.asarray([0.3, 1.0, 0.0, 0.0])        # cylinder r=0.3 h=1
    # side: sphere at x=0.35 -> gap 0.05 -> depth r_s - 0.05 = 0.05
    [pt], [n], [d] = _sphere_cylinder(pa, pb, _T((0.35, 0, 0)), _T())
    np.testing.assert_allclose(float(d), 0.05, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(pt), [0.3, 0, 0], atol=1e-12)
    # cap: sphere above the top cap at z=0.55
    [pt], [n], [d] = _sphere_cylinder(pa, pb, _T((0, 0, 0.55)), _T())
    np.testing.assert_allclose(float(d), 0.05, atol=1e-12)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-12)
    # rim: diagonal approach to the cap edge
    c = np.asarray([0.3, 0.0, 0.5]) + 0.08 / np.sqrt(2) * np.asarray([1, 0, 1])
    [pt], [n], [d] = _sphere_cylinder(pa, pb, _T(c), _T())
    np.testing.assert_allclose(float(d), 0.02, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pt), [0.3, 0, 0.5], atol=1e-12)


def test_cone_apex_and_base():
    pa = jnp.asarray([0.3, 0.6, 0.0, 0.0])  # cone r=0.3 h=0.6
    # apex down: local +z (apex) -> world -y
    R = _rot_x(np.pi / 2)
    pts, ns, ds = _cone_halfspace(pa, FLOOR, _T((0, 0.28, 0), R), _T())
    ds = np.asarray(jnp.stack(ds))
    np.testing.assert_allclose(ds.max(), 0.02, atol=1e-12)   # apex slot
    assert (np.sort(ds)[:-1] < 0).all()                      # rim above
    # base down: apex up (+y)
    R2 = _rot_x(-np.pi / 2)
    pts, ns, ds = _cone_halfspace(pa, FLOOR, _T((0, 0.29, 0), R2), _T())
    ds = np.asarray(jnp.stack(ds))
    np.testing.assert_allclose(np.sort(ds)[-4:], 0.01, atol=1e-12)

    # sphere vs lateral surface: closest point on the slant
    # (p2=(0.25,0) -> t=0.567, closest=(0.17,-0.04), dist=0.0894,
    #  depth = 0.1-0.0894 = 0.0106)
    [pt], [n], [d] = _sphere_cone(
        jnp.asarray([0.1, 0.0, 0.0, 0.0]), pa,
        _T((0.25, 0.0, 0.0)), _T(),
    )
    np.testing.assert_allclose(float(d), 0.1 - np.hypot(0.08, 0.04),
                               atol=1e-12)
    assert float(n[0]) > 0.7  # normal mostly radial, tilted by the slant
    assert float(n[2]) > 0.0


def test_cylinder_world_settles_on_side():
    """A free cylinder dropped on its side must come to rest WITHOUT
    rolling away (flat line contact) — the behavior that distinguishes a
    true cylinder from its capsule alias."""
    import scipy.spatial.transform as st

    joints = [dict(type="free", name="root", body_name="cyl", parent=-1,
                   mass=1.0)]
    shapes = (
        ShapeSpec(kind="cylinder", body_index=0, offset=_T(),
                  params=jnp.asarray([0.2, 0.6, 0.0, 0.0])),
        ShapeSpec(kind="halfspace", body_index=-1, offset=_T(),
                  params=FLOOR),
    )
    model = build_model(joints, dt=0.002, shapes=shapes)
    assert total_slots(model) == 8

    # axis along x (lying on side), slightly above the floor
    rotvec = st.Rotation.from_matrix(
        np.asarray([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], float)
    ).as_rotvec()
    q = jnp.zeros(model.nq)
    q = q.at[0:3].set(jnp.asarray(rotvec))
    q = q.at[4].set(0.25)
    s = State(q=q, v=jnp.zeros(model.nq))
    for _ in range(400):
        s = contact_step(model, s, jnp.zeros(model.nq))
    # resting height = radius; velocities died out
    assert abs(float(s.q[4]) - 0.2) < 0.02, float(s.q[4])
    assert float(jnp.max(jnp.abs(s.v))) < 0.05


def test_cylinder_world_settles_on_cap():
    import scipy.spatial.transform as st

    joints = [dict(type="free", name="root", body_name="cyl", parent=-1,
                   mass=1.0)]
    shapes = (
        ShapeSpec(kind="cylinder", body_index=0, offset=_T(),
                  params=jnp.asarray([0.2, 0.6, 0.0, 0.0])),
        ShapeSpec(kind="halfspace", body_index=-1, offset=_T(),
                  params=FLOOR),
    )
    model = build_model(joints, dt=0.002, shapes=shapes)
    rotvec = st.Rotation.from_matrix(np.asarray(_rot_x(-np.pi / 2))).as_rotvec()
    q = jnp.zeros(model.nq)
    q = q.at[0:3].set(jnp.asarray(rotvec))
    q = q.at[4].set(0.33)
    s = State(q=q, v=jnp.zeros(model.nq))
    for _ in range(400):
        s = contact_step(model, s, jnp.zeros(model.nq))
    # standing on the cap: center at half height
    assert abs(float(s.q[4]) - 0.3) < 0.02, float(s.q[4])
    assert float(jnp.max(jnp.abs(s.v))) < 0.05

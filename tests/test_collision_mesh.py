"""Non-convex trimesh, point cloud, and line segment collision + the
EulerFreeJoint — the round-3 verdict's collision-completeness items.

Reference: DART routes meshes through libccd GJK/MPR / ODE trimesh
vertex-face contacts (dart/collision/dart/DARTCollide.hpp:42,179),
PointCloudShape.hpp:1, LineSegmentShape.hpp:1, EulerFreeJoint.hpp:1.
The repo standard for collision features: SETTLING WORLDS, not just pair
tests (see tests/test_collision_cylinder.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import ShapeSpec, State, build_model
from nimblephysics_tpu.ops.collide import total_slots
from nimblephysics_tpu.ops.contact import contact_step
from nimblephysics_tpu.ops.lie import Transform


def _tf(p=(0.0, 0.0, 0.0)):
    return Transform(jnp.eye(3), jnp.asarray(p, jnp.float64))


def _cube_trimesh(half=0.1):
    """Closed cube mesh with outward winding: 8 verts, 12 triangles."""
    h = half
    v = np.array(
        [[sx, sy, sz] for sx in (-h, h) for sy in (-h, h) for sz in (-h, h)]
    )
    # faces as quads (outward), split into triangles
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c, d in quads:
        tris += [(a, b, c), (a, c, d)]
    # fix winding so normals point OUTWARD: normal . centroid > 0
    fixed = []
    for t in tris:
        a, b, c = v[t[0]], v[t[1]], v[t[2]]
        n = np.cross(b - a, c - a)
        ctr = (a + b + c) / 3
        fixed.append(t if np.dot(n, ctr) > 0 else (t[0], t[2], t[1]))
    return v, np.asarray(fixed, np.int64)


def _valley_trimesh(width=2.0, depth=0.4):
    """A NON-convex static terrain: two inclined slabs meeting in a
    crease at the origin (a convex hull would fill the crease — exactly
    the geometry convex colliders get wrong). Upward/outward winding."""
    w, d = width, depth
    v = np.array([
        [-w, d, -w], [-w, d, w],    # left rim
        [0.0, 0.0, -w], [0.0, 0.0, w],   # crease
        [w, d, -w], [w, d, w],      # right rim
    ])
    tris = [
        (0, 2, 1), (1, 2, 3),       # left slope (normal +y-ish)
        (2, 4, 3), (3, 4, 5),       # right slope
    ]
    fixed = []
    for t in tris:
        a, b, c = v[t[0]], v[t[1]], v[t[2]]
        n = np.cross(b - a, c - a)
        fixed.append(t if n[1] > 0 else (t[0], t[2], t[1]))
    return v, np.asarray(fixed, np.int64)


def _free_body_world(shapes, mass=1.0, y0=0.3, dt=1e-3, jtype="free"):
    joints = [dict(type=jtype, name="root", body_name="b", parent=-1,
                   mass=mass, moment=np.eye(3) * 0.01)]
    m = build_model(joints, dt=dt, shapes=shapes, actuated=())
    q = jnp.zeros(m.nq).at[4].set(y0)   # translation y (both free kinds)
    return m, State(q=q, v=jnp.zeros(m.nq))


def _settle(m, s, steps):
    def body(s, _):
        s2 = contact_step(m, s, jnp.zeros(m.nq))
        return s2, ()

    s, _ = jax.lax.scan(body, s, None, length=steps)
    return s


def test_trimesh_cube_settles_in_nonconvex_valley():
    """Mesh-mesh: a trimesh cube dropped into a trimesh valley crease must
    come to rest ON the slopes (a convex approximation would rest at the
    hull surface instead of reaching the crease)."""
    cv, ct = _cube_trimesh(0.1)
    vv, vt = _valley_trimesh()
    shapes = (
        ShapeSpec(kind="trimesh", body_index=0, offset=_tf(),
                  vertices=jnp.asarray(cv), faces=ct),
        ShapeSpec(kind="trimesh", body_index=-1, offset=_tf(),
                  vertices=jnp.asarray(vv), faces=vt),
    )
    m, s = _free_body_world(shapes, y0=0.4)
    assert total_slots(m) == 8
    s = _settle(m, s, 1500)
    y = float(s.q[4])
    v = np.abs(np.asarray(s.v)).max()
    # rest: crease sits at y=0, cube half-extent 0.1 -> center near the
    # crease, definitely below the rim (y=0.4) and above the crease floor
    assert v < 0.2, f"cube did not settle, |v|={v}"
    assert 0.02 < y < 0.25, f"cube rest height {y}"
    assert np.isfinite(np.asarray(s.q)).all()


def test_trimesh_cube_settles_on_halfspace_floor():
    cv, ct = _cube_trimesh(0.1)
    shapes = (
        ShapeSpec(kind="trimesh", body_index=0, offset=_tf(),
                  vertices=jnp.asarray(cv), faces=ct),
        ShapeSpec(kind="halfspace", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0])),
    )
    m, s = _free_body_world(shapes, y0=0.3)
    s = _settle(m, s, 1200)
    assert np.abs(np.asarray(s.v)).max() < 0.05
    assert abs(float(s.q[4]) - 0.1) < 0.02   # resting on a face


def test_sphere_rests_on_trimesh_slopes():
    vv, vt = _valley_trimesh()
    shapes = (
        ShapeSpec(kind="sphere", body_index=0, offset=_tf(),
                  params=jnp.asarray([0.15, 0.0, 0.0, 0.0])),
        ShapeSpec(kind="trimesh", body_index=-1, offset=_tf(),
                  vertices=jnp.asarray(vv), faces=vt),
    )
    m, s = _free_body_world(shapes, y0=0.5)
    s = _settle(m, s, 1500)
    assert np.abs(np.asarray(s.v)).max() < 0.2
    # ball radius 0.15 wedged in the crease (slope angle atan(0.2)):
    # center height = r / cos... roughly r < y < 2r
    y = float(s.q[4])
    assert 0.1 < y < 0.35, f"sphere rest height {y}"


def test_pointcloud_settles_on_floor():
    pts = np.array([[-0.1, 0.0, -0.1], [0.1, 0.0, -0.1],
                    [-0.1, 0.0, 0.1], [0.1, 0.0, 0.1],
                    [0.0, 0.1, 0.0]])
    shapes = (
        ShapeSpec(kind="pointcloud", body_index=0, offset=_tf(),
                  params=jnp.asarray([0.05, 0.0, 0.0, 0.0]),
                  vertices=jnp.asarray(pts)),
        ShapeSpec(kind="halfspace", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0])),
    )
    m, s = _free_body_world(shapes, y0=0.3)
    s = _settle(m, s, 1200)
    assert np.abs(np.asarray(s.v)).max() < 0.05
    # the 4 bottom points (radius 0.05) carry the body: center y ~ 0.05
    assert abs(float(s.q[4]) - 0.05) < 0.02


def test_sphere_rests_on_linesegment():
    segs = np.array([[[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0]]])
    shapes = (
        ShapeSpec(kind="sphere", body_index=0, offset=_tf(),
                  params=jnp.asarray([0.1, 0.0, 0.0, 0.0])),
        ShapeSpec(kind="linesegment", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.02, 0.0, 0.0, 0.0]),
                  vertices=jnp.asarray(segs)),
        # side planes keep the ball from rolling off along z
        ShapeSpec(kind="halfspace", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.0, 1.0, 0.0, -0.4])),
    )
    m, s = _free_body_world(shapes, y0=0.25)
    s = _settle(m, s, 800)
    # resting on the segment: center ~ r_s + r_seg above the line (or it
    # fell to the backstop plane at -0.3 — fail in that case)
    y = float(s.q[4])
    assert y > 0.0, f"sphere fell off the segment: y={y}"
    assert abs(y - 0.12) < 0.03


def test_euler_free_joint_matches_free_joint_dynamics():
    """EulerFreeJoint freefall+spin trajectory must match the exponential-
    coordinate free joint in WORLD pose (the coordinates differ, the
    physics must not). Integrator truncation differs at O(dt) between the
    charts — tolerance verified to halve with dt."""
    from nimblephysics_tpu.ops import dynamics as dyn
    from nimblephysics_tpu.simulation.step import rollout

    def one(jtype):
        joints = [dict(type=jtype, name="root", body_name="b", parent=-1,
                       mass=1.3, com=[0.02, 0.01, -0.03],
                       moment=np.diag([0.02, 0.03, 0.025]))]
        return build_model(joints, dt=0.002)

    mf, me = one("free"), one("euler_free")
    v0 = jnp.asarray([0.8, -0.5, 0.3, 0.1, 0.2, -0.1])
    acts = jnp.zeros((400, mf.num_actions))
    ff, _ = rollout(mf, State(q=jnp.zeros(6), v=v0), acts)
    fe, _ = rollout(me, State(q=jnp.zeros(6), v=v0), acts)
    Tf = dyn.forward_kinematics(mf, ff.q).T_wb[0]
    Te = dyn.forward_kinematics(me, fe.q).T_wb[0]
    assert float(jnp.max(jnp.abs(Tf.p - Te.p))) < 5e-6
    assert float(jnp.max(jnp.abs(Tf.R - Te.R))) < 2e-3


def test_euler_free_subspace_matches_fd():
    from nimblephysics_tpu.ops import joints as J

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal(6) * 0.4)
    axes = jnp.zeros((3, 3))
    S = np.asarray(J.joint_subspace("euler_free", q, axes))
    eps = 1e-7
    for j in range(6):
        qp = np.asarray(q).copy()
        qp[j] += eps
        qm = np.asarray(q).copy()
        qm[j] -= eps
        Tp = J.joint_transform("euler_free", jnp.asarray(qp), axes)
        Tm = J.joint_transform("euler_free", jnp.asarray(qm), axes)
        T0 = J.joint_transform("euler_free", q, axes)
        dR = (np.asarray(Tp.R) - np.asarray(Tm.R)) / (2 * eps)
        dp = (np.asarray(Tp.p) - np.asarray(Tm.p)) / (2 * eps)
        Rt = np.asarray(T0.R).T
        wx = Rt @ dR
        w = np.array([wx[2, 1] - wx[1, 2], wx[0, 2] - wx[2, 0],
                      wx[1, 0] - wx[0, 1]]) / 2
        col = np.concatenate([w, Rt @ dp])
        np.testing.assert_allclose(col, S[:, j], atol=1e-6)

"""Contact & LCP: physical behavior + the crown-jewel gradient checks.

Mirrors the reference's contact test strategy (`test_Gradients.cpp`,
`test_CollideGradient.cpp`, GradientTestUtils.hpp): physical scenarios plus
finite-difference verification of gradients THROUGH frictional contact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import Model, ShapeSpec, State, build_model
from nimblephysics_tpu.ops.contact import contact_step
from nimblephysics_tpu.ops import lcp as lcp_mod
from nimblephysics_tpu.ops.lie import Transform
from nimblephysics_tpu.simulation.step import rollout, step
from nimblephysics_tpu.utils.fd import fd_jacobian


def _ball_world(restitution=0.0, friction=1.0, dt=0.001) -> Model:
    """A free sphere over a ground halfspace at y=0."""
    joints = [
        dict(type="free", name="ball_j", body_name="ball", parent=-1,
             mass=1.0, moment=np.eye(3) * 0.01)
    ]
    shapes = (
        ShapeSpec(kind="sphere", body_index=0,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.1, 0.0, 0.0, 0.0]),
                  friction=jnp.asarray(friction),
                  restitution=jnp.asarray(restitution)),
        ShapeSpec(kind="halfspace", body_index=-1,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0]),
                  friction=jnp.asarray(friction),
                  restitution=jnp.asarray(restitution)),
    )
    return build_model(joints, dt=dt, shapes=shapes)


def _drop(model, q0, v0, steps):
    s = State(q=jnp.asarray(q0, dtype=jnp.float64),
              v=jnp.asarray(v0, dtype=jnp.float64))
    acts = jnp.zeros((steps, model.num_actions))
    final, traj = jax.jit(lambda s, a: rollout(model, s, a))(s, acts)
    return final, traj


def test_ball_rests_on_floor():
    model = _ball_world()
    final, traj = _drop(model, [0, 0, 0, 0, 0.1001, 0], np.zeros(6), 500)
    # Sphere radius 0.1: resting height = 0.1 (up to LCP tolerance).
    assert abs(float(final.q[4]) - 0.1) < 5e-3, float(final.q[4])
    assert abs(float(final.v[4])) < 1e-4


def test_ball_bounces_with_restitution():
    model = _ball_world(restitution=0.8)
    # drop from 0.3: hits floor at v = −sqrt(2g·0.2) ≈ −1.98, should bounce up
    final, traj = _drop(model, [0, 0, 0, 0, 0.3, 0], np.zeros(6), 400)
    ys = np.asarray(traj.q[:, 4])
    vy = np.asarray(traj.v[:, 4])
    i_impact = int(np.argmin(ys[:300]))
    assert vy[max(i_impact - 2, 0)] < -1.5        # falling before impact
    post = vy[i_impact + 2: i_impact + 10]
    assert post.max() > 1.0, post                 # bounced up ~0.8 * impact
    assert ys.max() > 0.25                        # rebound height significant


def test_ball_slides_and_friction_stops_it():
    model = _ball_world(friction=0.5)
    # ball on the floor with tangential velocity: friction must decelerate it
    final, traj = _drop(model, [0, 0, 0, 0, 0.1, 0], [0, 0, 0, 2.0, 0, 0], 800)
    vx = np.asarray(traj.v[:, 3])
    assert vx[0] > 1.9
    assert abs(vx[-1]) < abs(vx[0])               # decelerating
    # frictionless control: same drop with mu=0 keeps sliding
    m0 = _ball_world(friction=0.0)
    _, traj0 = _drop(m0, [0, 0, 0, 0, 0.1, 0], [0, 0, 0, 2.0, 0, 0], 800)
    vx0 = np.asarray(traj0.v[:, 3])
    assert vx0[-1] > 1.9 * 0.99                   # no tangential loss


def test_jump_worm_lands_on_floor():
    model = builders.jump_worm(dt=0.002)
    s0 = State(q=jnp.zeros(model.nq).at[2].set(1.2).at[3].set(1.2),
               v=jnp.zeros(model.nq))
    acts = jnp.zeros((700, model.num_actions))
    final, traj = jax.jit(lambda: rollout(model, s0, acts))()
    ys = np.asarray(traj.q[:, 1])
    # root box (half-extent 0.05) falls from 0 to the floor at y=-0.575 and
    # stops resting (y ≈ -0.525), instead of falling through
    assert ys[-1] > -0.575, ys[-1]
    assert abs(float(final.v[1])) < 0.05


def test_lcp_gradient_matches_fd_resting():
    """d(v_next)/d(v) through an ACTIVE contact vs finite differences —
    the core claim of the whole gradient engine."""
    model = _ball_world(friction=0.7, dt=0.01)
    q0 = np.array([0.1, -0.2, 0.05, 0.0, 0.0999, 0.0])
    v0 = np.array([0.1, 0.0, 0.0, 0.5, -0.1, 0.0])

    def f(v):
        s = contact_step(model, State(jnp.asarray(q0), jnp.asarray(v)),
                         jnp.zeros(6))
        return s.v

    J_ad = np.asarray(jax.jacrev(lambda v: f(v))(jnp.asarray(v0)))
    J_fd = fd_jacobian(lambda v: np.asarray(f(jnp.asarray(v))), v0, eps=1e-7)
    np.testing.assert_allclose(J_ad, J_fd, atol=2e-5,
                               err_msg="velVel Jacobian through contact")


def test_lcp_gradient_matches_fd_wrt_position():
    model = _ball_world(friction=0.7, dt=0.01)
    q0 = np.array([0.0, 0.0, 0.0, 0.0, 0.0995, 0.0])
    v0 = np.array([0.0, 0.0, 0.0, 0.3, -0.05, 0.0])

    def f(q):
        s = contact_step(model, State(jnp.asarray(q), jnp.asarray(v0)),
                         jnp.zeros(6))
        return s.v

    J_ad = np.asarray(jax.jacrev(f)(jnp.asarray(q0)))
    J_fd = fd_jacobian(lambda q: np.asarray(f(jnp.asarray(q))), q0, eps=1e-7)
    np.testing.assert_allclose(J_ad, J_fd, atol=5e-4,
                               err_msg="posVel Jacobian through contact")


def test_lcp_gradient_wrt_control_through_rollout():
    """Gradient of a loss through a multi-step contact rollout vs directional
    finite differences (what trajectory optimization actually consumes)."""
    model = builders.jump_worm(dt=0.002)
    # Start RESTING ON THE FLOOR with the worm mid-wiggle so the contact set
    # is active and changing during the rollout (an airborne start would never
    # touch the LCP).
    s_air = State(q=jnp.zeros(model.nq).at[2].set(1.2).at[3].set(1.2),
                  v=jnp.zeros(model.nq))
    s0, _ = rollout(model, s_air, jnp.zeros((400, 2)))
    s0 = State(q=s0.q, v=s0.v.at[2].set(3.0))   # kick a pole
    T = 30
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((T, model.num_actions)) * 40.0)

    @jax.jit
    def loss(u):
        final, traj = rollout(model, s0, u)
        return jnp.sum(final.q**2) + 0.1 * jnp.sum(traj.v**2)

    g_ad = np.asarray(jax.jit(jax.grad(loss))(u0))
    eps = 1e-6
    for seed in range(4):
        d = rng.standard_normal(u0.shape)
        d /= np.linalg.norm(d)
        fd = (float(loss(u0 + eps * d)) - float(loss(u0 - eps * d))) / (2 * eps)
        ad = float(np.sum(g_ad * d))
        np.testing.assert_allclose(ad, fd, rtol=2e-4, atol=1e-6)


def test_joint_limit_constraint():
    """Catapult pole has q limits [0, pi]: driving it down must stop at 0."""
    model = builders.catapult(dt=0.002)
    q0 = jnp.zeros(model.nq).at[3].set(0.3)   # tail0 at 0.3 rad
    s0 = State(q=q0, v=jnp.zeros(model.nq))
    # push strongly toward the lower limit
    acts = jnp.tile(jnp.asarray([[-300.0, 0.0, 0.0]]), (400, 1))
    final, traj = jax.jit(lambda: rollout(model, s0, acts))()
    qmin = float(jnp.min(traj.q[:, 3]))
    assert qmin > -0.05, qmin                 # limit holds (small violation ok)


def test_pgs_solves_simple_lcp():
    """PGS vs a hand-solvable LCP."""
    A = jnp.asarray([[2.0, 1.0], [1.0, 2.0]])
    b = jnp.asarray([1.0, -1.0])
    lo = jnp.zeros(2)
    hi = jnp.full((2,), lcp_mod._BIG)
    x = lcp_mod.pgs_solve(A, b, lo, hi, jnp.zeros(2), jnp.zeros(2), (-1, -1), 100)
    x = np.asarray(x)
    # complementarity: x >= 0, w = Ax - b >= 0, x·w = 0
    w = np.asarray(A) @ x - np.asarray(b)
    assert np.all(x >= -1e-10)
    assert np.all(w >= -1e-8)
    assert abs(x @ w) < 1e-8


def test_box_stacks_on_box():
    """Box-box vertex contacts: a small box dropped on a static big box
    rests on top (test for the new box-box narrow phase)."""
    from nimblephysics_tpu.models.model import build_model

    joints = [dict(type="free", name="j", body_name="cube", parent=-1,
                   mass=1.0, moment=np.eye(3) * 0.01)]
    shapes = (
        ShapeSpec(kind="box", body_index=0,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.2, 0.2, 0.2, 0.0]),
                  friction=jnp.asarray(0.8)),
        ShapeSpec(kind="box", body_index=-1,
                  offset=Transform(np.eye(3), np.asarray([0.0, -0.5, 0.0])),
                  params=jnp.asarray([1.0, 1.0, 1.0, 0.0]),
                  friction=jnp.asarray(0.8)),
    )
    model = build_model(joints, dt=0.002, shapes=shapes)
    # static box top at y=0; cube (half 0.1) dropped from 0.25
    s0 = State(q=jnp.zeros(6).at[4].set(0.25), v=jnp.zeros(6))
    final, traj = jax.jit(
        lambda: rollout(model, s0, jnp.zeros((600, model.num_actions)))
    )()
    assert abs(float(final.q[4]) - 0.1) < 0.02, float(final.q[4])
    assert abs(float(final.v[4])) < 0.05
    # tilted drop also settles without exploding
    s1 = State(q=jnp.zeros(6).at[4].set(0.3).at[0].set(0.4), v=jnp.zeros(6))
    final2, _ = jax.jit(
        lambda: rollout(model, s1, jnp.zeros((800, model.num_actions)))
    )()
    assert np.all(np.isfinite(np.asarray(final2.q)))
    assert float(final2.q[4]) > 0.05


def test_capsule_capsule_contact():
    """Two crossed capsules resting: closest-segment contact resolves."""
    joints = [dict(type="free", name="c1", body_name="c1", parent=-1,
                   mass=1.0, moment=np.eye(3) * 0.01)]
    shapes = (
        ShapeSpec(kind="capsule", body_index=0,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.05, 0.4, 0.0, 0.0])),
        # static horizontal capsule at the origin (rotated z->x)
        ShapeSpec(kind="capsule", body_index=-1,
                  offset=Transform(
                      np.asarray([[0.0, 0, 1.0], [0, 1.0, 0], [-1.0, 0, 0]]),
                      np.zeros(3)),
                  params=jnp.asarray([0.05, 0.6, 0.0, 0.0])),
        ShapeSpec(kind="halfspace", body_index=-1,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.0, 1.0, 0.0, -1.0])),
    )
    model = build_model(joints, dt=0.002, shapes=shapes)
    # falling capsule crosses the static one (perpendicular, above it)
    q0 = jnp.zeros(6).at[0].set(np.pi / 2).at[4].set(0.3)  # rotate z->.. drop
    s0 = State(q=q0, v=jnp.zeros(6))
    final, traj = jax.jit(
        lambda: rollout(model, s0, jnp.zeros((400, model.num_actions)))
    )()
    ys = np.asarray(traj.q[:, 4])
    assert np.all(np.isfinite(ys))
    # rests on the static capsule (2 radii above its axis) not the floor
    assert ys[-1] > 0.05, ys[-1]


# ---------------------------------------------------------------------------
# Convex hull (mesh) collision
# ---------------------------------------------------------------------------

def _cube_hull(size=0.1):
    """Hull data for a cube — lets us cross-check convex math vs box math."""
    from nimblephysics_tpu.utils.mesh import convex_hull_data

    h = size / 2.0
    pts = np.asarray([[sx * h, sy * h, sz * h]
                      for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    return convex_hull_data(pts)


def _convex_drop_model(dt=0.002):
    from nimblephysics_tpu.models.model import ShapeSpec, build_model
    from nimblephysics_tpu.ops.lie import Transform

    verts, faces = _cube_hull(0.1)
    joints = [dict(type="free", name="root", body_name="block", parent=-1,
                   mass=1.0, moment=np.eye(3) * 1e-3)]
    shapes = (
        ShapeSpec(kind="convex", body_index=0,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.zeros(4),
                  vertices=jnp.asarray(verts), faces=jnp.asarray(faces)),
        ShapeSpec(kind="halfspace", body_index=-1,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([0.0, 1.0, 0.0, 0.0])),
    )
    return build_model(joints, dt=dt, shapes=shapes, actuated=())


def test_convex_cube_rests_on_floor():
    """A cube-shaped convex hull dropped on the floor must land and rest
    (the convex-halfspace slots carry the full resting contact set)."""
    from nimblephysics_tpu.models.model import State
    from nimblephysics_tpu.simulation.step import rollout

    model = _convex_drop_model()
    q0 = jnp.zeros(6).at[4].set(0.2)        # 20 cm above the floor
    s0 = State(q=q0, v=jnp.zeros(6))
    acts = jnp.zeros((400, 0))
    final, traj = jax.jit(lambda s: rollout(model, s, acts))(s0)
    y = float(final.q[4])
    vy = float(final.v[4])
    assert abs(y - 0.05) < 0.02, y          # resting: center ~half-extent up
    assert abs(vy) < 0.05, vy


def test_sphere_convex_matches_sphere_box():
    """Sphere vs cube-hull must reproduce the analytic sphere-box result."""
    from nimblephysics_tpu.models.model import ShapeSpec
    from nimblephysics_tpu.ops import collide
    from nimblephysics_tpu.ops.lie import Transform

    verts, faces = _cube_hull(0.2)
    eye = jnp.eye(3)
    Ta = Transform(eye, jnp.asarray([0.0, 0.145, 0.03]))   # sphere above
    Tb = Transform(eye, jnp.zeros(3))
    sph = jnp.asarray([0.05, 0.0, 0.0, 0.0])
    box = jnp.asarray([0.2, 0.2, 0.2, 0.0])
    p_ref, n_ref, d_ref = collide._sphere_box(sph, box, Ta, Tb)
    sb = ShapeSpec(kind="convex", body_index=0, offset=Transform(eye, jnp.zeros(3)),
                   params=jnp.zeros(4), vertices=jnp.asarray(verts),
                   faces=jnp.asarray(faces))
    p_c, n_c, d_c = collide._sphere_convex(sph, sb, Ta, Tb)
    np.testing.assert_allclose(np.asarray(d_c[0]), np.asarray(d_ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(n_c[0]), np.asarray(n_ref[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p_c[0]), np.asarray(p_ref[0]), atol=1e-3)


def test_convex_contact_gradients_finite():
    """AD through convex contact (the mesh analogue of the reference's
    DifferentiableContactConstraint geometry gradients)."""
    from nimblephysics_tpu.models.model import State
    from nimblephysics_tpu.simulation.step import step

    model = _convex_drop_model()

    def loss(y0):
        q0 = jnp.zeros(6).at[4].set(y0)
        s = step(model, State(q0, jnp.zeros(6).at[4].set(-0.5)), jnp.zeros(0))
        return jnp.sum(s.v ** 2)

    g = jax.grad(loss)(jnp.asarray(0.049))   # penetrating: contact active
    assert np.isfinite(float(g))


def test_drchubo_meshes_load_as_hulls():
    """The drchubo URDF ships stl collision meshes; they must come in as
    convex shapes with bounded vertex counts."""
    import os
    path = "/root/reference/data/urdf/drchubo/drchubo.urdf"
    if not os.path.exists(path):
        pytest.skip("drchubo not present")
    from nimblephysics_tpu.utils.urdf_parser import parse_urdf

    model, s0 = parse_urdf(path)
    kinds = [s.kind for s in model.shapes]
    assert "convex" in kinds
    for s in model.shapes:
        if s.kind == "convex":
            assert s.vertices.shape[0] <= 24
            assert s.vertices.shape[1] == 3
            assert s.faces.shape[1] == 4


def test_heightmap_contact_and_slope_normal():
    """Heightmap terrain: a sphere dropped on a sloped grid rests with the
    slope's surface normal; the contact is differentiable wrt q. (The
    reference has HeightmapShape but no narrow-phase for it — this exceeds
    parity.)"""
    from nimblephysics_tpu.models.model import ShapeSpec, State, build_model
    from nimblephysics_tpu.ops import collide
    from nimblephysics_tpu.ops.lie import Transform
    from nimblephysics_tpu.simulation.step import rollout, step

    # 8x8 grid: plane sloping up in +x with slope 0.2, spacing 0.5
    H = W = 8
    dx = dz = 0.5
    x0 = z0 = -1.75
    xs = x0 + np.arange(W) * dx
    heights = np.broadcast_to(0.2 * xs, (H, W)).copy()
    hm = ShapeSpec(
        kind="heightmap", body_index=-1,
        offset=Transform(jnp.eye(3), jnp.zeros(3)),
        params=jnp.asarray([x0, z0, dx, dz]),
        vertices=jnp.asarray(heights),
    )
    # static geometry probe: depth/normal of a point query
    d, n = collide._point_heightmap(jnp.asarray([0.5, 0.0, 0.0]), hm,
                                    Transform(jnp.eye(3), jnp.zeros(3)))
    assert abs(float(d) - 0.1) < 1e-6          # height at x=0.5 is 0.1
    n_expect = np.asarray([-0.2, 1.0, 0.0])
    n_expect /= np.linalg.norm(n_expect)
    np.testing.assert_allclose(np.asarray(n), n_expect, atol=1e-6)

    # dynamics: ball dropped above the slope settles ON the slope
    joints = [dict(type="free", name="root", body_name="ball", parent=-1,
                   mass=1.0, moment=np.eye(3) * 4e-4)]
    shapes = (
        ShapeSpec(kind="sphere", body_index=0,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([0.1, 0.0, 0.0, 0.0]),
                  friction=jnp.asarray(2.0)),
        hm,
    )
    model = build_model(joints, dt=0.002, shapes=shapes, actuated=())
    s0 = State(q=jnp.zeros(6).at[4].set(0.5), v=jnp.zeros(6))
    final, _ = jax.jit(lambda s: rollout(model, s, jnp.zeros((500, 0))))(s0)
    x_f, y_f = float(final.q[3]), float(final.q[4])
    # resting on the surface: y ≈ h(x) + r·cos-ish (within tolerance)
    assert abs(y_f - (0.2 * x_f + 0.1)) < 0.04, (x_f, y_f)

    def loss(y0):
        s = step(model, State(jnp.zeros(6).at[4].set(y0),
                              jnp.zeros(6).at[4].set(-1.0)), jnp.zeros(0))
        return jnp.sum(s.v ** 2)

    g = jax.grad(loss)(jnp.asarray(0.05))
    assert np.isfinite(float(g))


def test_box_box_edge_edge_crossing():
    """Two bars crossing like an X penetrate with NO vertex inside either
    box — only the edge-edge SAT slots can see it (reference: ODE dBoxBox
    edge cases inside `DARTCollide.hpp:79`)."""
    from nimblephysics_tpu.ops import collide

    pa = jnp.asarray([0.2, 0.2, 4.0, 0.0])   # bar A along z
    pb = jnp.asarray([4.0, 0.2, 0.2, 0.0])   # bar B along x
    Ta = Transform(jnp.eye(3), jnp.asarray([0.0, 0.17, 0.0]))
    Tb = Transform(jnp.eye(3), jnp.zeros(3))
    pts, ns, ds = collide._box_box(pa, pb, Ta, Tb)
    depth = np.asarray(jnp.stack(ds))
    assert depth.shape[0] == 25
    # all 16 vertex slots inactive, the crossing resolved by an edge slot
    assert np.all(depth[:16] <= 0.0)
    k = int(np.argmax(depth))
    assert k >= 16
    assert abs(depth[k] - 0.03) < 1e-6
    n = np.asarray(ns[k])
    assert np.allclose(n, [0.0, 1.0, 0.0], atol=1e-6)     # B -> A is +y
    p = np.asarray(pts[k])
    assert np.allclose(p, [0.0, 0.085, 0.0], atol=1e-5)

    # depth gradient wrt A's height is -1 (pure SAT overlap along +y)
    def max_depth(y):
        _, _, ds2 = collide._box_box(
            pa, pb, Transform(jnp.eye(3), jnp.asarray([0.0, y, 0.0])), Tb)
        return jnp.max(jnp.stack(ds2))

    g = float(jax.grad(max_depth)(jnp.asarray(0.17)))
    assert abs(g + 1.0) < 1e-4


def test_bar_rests_crossed_on_rails():
    """Drop a bar across two static perpendicular rails: only edge-edge
    contacts support it (no vertex of either box penetrates the other) —
    it would tunnel straight through with vertex-only slots."""
    joints = [dict(type="free", name="j", body_name="bar", parent=-1,
                   mass=1.0, moment=np.eye(3) * 0.05)]
    rail = jnp.asarray([2.0, 0.2, 0.2, 0.0])
    shapes = (
        ShapeSpec(kind="box", body_index=0,
                  offset=Transform(np.eye(3), np.zeros(3)),
                  params=jnp.asarray([0.2, 0.2, 2.0, 0.0]),
                  friction=jnp.asarray(0.9)),
        ShapeSpec(kind="box", body_index=-1,
                  offset=Transform(np.eye(3), np.asarray([0.0, 0.0, -0.6])),
                  params=rail, friction=jnp.asarray(0.9)),
        ShapeSpec(kind="box", body_index=-1,
                  offset=Transform(np.eye(3), np.asarray([0.0, 0.0, 0.6])),
                  params=rail, friction=jnp.asarray(0.9)),
    )
    model = build_model(joints, dt=0.002, shapes=shapes)
    s0 = State(q=jnp.zeros(6).at[4].set(0.4), v=jnp.zeros(6))
    final, _ = jax.jit(
        lambda: rollout(model, s0, jnp.zeros((700, model.num_actions)))
    )()
    assert np.all(np.isfinite(np.asarray(final.q)))
    # rests on top: center at rail-top (0.1) + bar-half (0.1) = 0.2
    assert abs(float(final.q[4]) - 0.2) < 0.04, float(final.q[4])
    assert abs(float(final.v[4])) < 0.1

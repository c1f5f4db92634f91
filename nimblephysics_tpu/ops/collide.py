"""Differentiable narrow-phase collision with STATIC contact-slot topology.

TPU re-design of `dart/collision/dart/DARTCollide.hpp` (analytic primitive
pairs). The reference detects a variable number of contacts at runtime and
builds constraint objects; XLA needs fixed shapes, so instead:

  * All candidate shape pairs are enumerated at model-build time (Python
    static), each contributing a FIXED number of contact slots (1 for
    sphere-*, 8 box corners vs a halfspace, 2 capsule ends, ...).
  * Each slot computes (point, normal, depth, active) differentiably from q.
    `active = depth > 0` masks the LCP rows, replacing the reference's
    dynamic constraint groups (`ConstraintSolver::buildConstrainedGroups`).
  * Because slots are statically bound to body pairs, contact Jacobians are
    assembled with static indexing — and gradients of contact geometry wrt
    q (the reference's hand-derived `DifferentiableContactConstraint`
    screw-axis formulas) come from plain AD through these functions.

Conventions: contact normal points from body B into body A; depth > 0 means
penetrating. Positive normal impulse pushes A along +n and B along −n.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, ShapeSpec
from nimblephysics_tpu.ops.lie import Transform


class ContactSlots(NamedTuple):
    """Fixed-size contact buffers (n_slots, ...)."""

    point: jax.Array      # (K, 3) world contact point
    normal: jax.Array     # (K, 3) world normal, B -> A
    depth: jax.Array      # (K,) penetration depth (>0 = contact)
    active: jax.Array     # (K,) bool
    body_a: Tuple[int, ...]   # static body indices (-1 = world/static)
    body_b: Tuple[int, ...]
    friction: jax.Array   # (K,) combined friction coefficient
    restitution: jax.Array  # (K,) combined restitution


def _box_corners(params: jax.Array) -> jax.Array:
    """(8, 3) corner offsets for full extents params[:3]."""
    half = params[:3] / 2.0
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
    , dtype=params.dtype)
    return signs * half


# Round shapes without a dedicated narrow phase for some partner kind
# degrade to their bounding capsule (params share the [r, h] z-axis
# convention) instead of silently getting zero contact slots — the pre-r3
# behavior the parsers relied on when they aliased cylinder->capsule
# (advisor r3 medium).
_CAPSULE_FALLBACK_KINDS = ("cylinder", "cone")


def _capsule_fallback(kind_a: str, kind_b: str) -> Tuple[str, str]:
    """Effective kinds after the bounding-capsule fallback, or the pair
    unchanged when a dedicated routine exists."""
    if _num_slots_table(kind_a, kind_b) > 0:
        return kind_a, kind_b
    fa = "capsule" if kind_a in _CAPSULE_FALLBACK_KINDS else kind_a
    fb = "capsule" if kind_b in _CAPSULE_FALLBACK_KINDS else kind_b
    return fa, fb


def _num_slots(kind_a: str, kind_b: str) -> int:
    return _num_slots_table(*_capsule_fallback(kind_a, kind_b))


def _num_slots_table(kind_a: str, kind_b: str) -> int:
    pair = (kind_a, kind_b)
    table = {
        ("sphere", "halfspace"): 1,
        ("box", "halfspace"): 8,
        ("capsule", "halfspace"): 2,
        ("sphere", "sphere"): 1,
        ("sphere", "box"): 1,
        ("box", "box"): 25,
        ("capsule", "box"): 2,
        ("capsule", "capsule"): 1,
        ("sphere", "capsule"): 1,
        ("convex", "halfspace"): 6,
        ("sphere", "convex"): 1,
        ("convex", "convex"): 8,
        ("convex", "box"): 8,
        ("sphere", "heightmap"): 1,
        ("box", "heightmap"): 8,
        ("capsule", "heightmap"): 2,
        ("convex", "heightmap"): 6,
        ("cylinder", "halfspace"): 8,
        ("sphere", "cylinder"): 1,
        ("cone", "halfspace"): 5,
        ("sphere", "cone"): 1,
        ("trimesh", "halfspace"): 6,
        ("sphere", "trimesh"): 1,
        ("trimesh", "trimesh"): 8,
        ("trimesh", "box"): 8,
        ("pointcloud", "halfspace"): 6,
        ("sphere", "pointcloud"): 1,
        ("pointcloud", "box"): 4,
        ("linesegment", "halfspace"): 4,
        ("sphere", "linesegment"): 1,
    }
    return table.get(pair, 0)


def enumerate_pairs(model: Model) -> List[Tuple[int, int, int]]:
    """Static list of (shape_index_a, shape_index_b, n_slots). Shapes on the
    same body (or both static) don't collide; the DART detector similarly
    skips adjacent bodies via its filter — we skip parent-child pairs too
    (`ConstraintSolver` uses a BodyNodeCollisionFilter)."""
    out = []
    shapes = model.shapes
    for i in range(len(shapes)):
        for j in range(len(shapes)):
            if i == j:
                continue
            a, b = shapes[i], shapes[j]
            if a.body_index == b.body_index:
                continue
            if a.body_index < 0 and b.body_index < 0:
                continue
            # parent-child adjacency filter
            if a.body_index >= 0 and b.body_index >= 0:
                if model.parents[a.body_index] == b.body_index:
                    continue
                if model.parents[b.body_index] == a.body_index:
                    continue
            # explicit filter (BodyNodeCollisionFilter analogue)
            pair = (a.body_index, b.body_index)
            nc = getattr(model, "no_collide", ()) or ()
            if pair in nc or (pair[1], pair[0]) in nc:
                continue
            n = _num_slots(a.kind, b.kind)
            if n == 0:
                continue
            # avoid double-counting symmetric pairs handled in one direction
            if _num_slots(b.kind, a.kind) > 0 and j < i:
                continue
            out.append((i, j, n))
    return out


def total_slots(model: Model) -> int:
    return sum(n for _, _, n in enumerate_pairs(model))


def _shape_world_transform(
    model: Model, shape: ShapeSpec, T_wb: List[Transform]
) -> Transform:
    off = Transform(shape.offset.R, shape.offset.p)
    if shape.body_index < 0:
        return off
    return T_wb[shape.body_index].compose(off)


def detect_contacts(model: Model, T_wb: List[Transform]) -> ContactSlots:
    """Fill every contact slot from current body transforms."""
    points, normals, depths, fric, rest = [], [], [], [], []
    bodies_a, bodies_b = [], []
    dtype = model.mass.dtype

    for ia, ib, n in enumerate_pairs(model):
        sa, sb = model.shapes[ia], model.shapes[ib]
        Ta = _shape_world_transform(model, sa, T_wb)
        Tb = _shape_world_transform(model, sb, T_wb)
        mu = jnp.sqrt(jnp.clip(sa.friction * sb.friction, 0.0))
        e = jnp.maximum(sa.restitution, sb.restitution)
        ps, ns, ds = _narrow_phase(sa, sb, Ta, Tb)
        for k in range(n):
            points.append(ps[k])
            normals.append(ns[k])
            depths.append(ds[k])
            bodies_a.append(sa.body_index)
            bodies_b.append(sb.body_index)
            fric.append(mu)
            rest.append(e)

    if not points:
        z3 = jnp.zeros((0, 3), dtype=dtype)
        z = jnp.zeros((0,), dtype=dtype)
        return ContactSlots(z3, z3, z, jnp.zeros((0,), dtype=bool), (), (), z, z)

    depth = jnp.stack(depths)
    return ContactSlots(
        point=jnp.stack(points),
        normal=jnp.stack(normals),
        depth=depth,
        active=depth > 0.0,
        body_a=tuple(bodies_a),
        body_b=tuple(bodies_b),
        friction=jnp.stack(fric),
        restitution=jnp.stack(rest),
    )


def _narrow_phase(sa: ShapeSpec, sb: ShapeSpec, Ta: Transform, Tb: Transform):
    """Dispatch on (static) kinds; returns lists of (point, normal, depth).

    Cylinder/cone pairs without a dedicated routine dispatch as their
    bounding capsules (`_capsule_fallback`) so such pairs degrade to the
    capsule approximation rather than passing through each other."""
    pa, pb = sa.params, sb.params
    kind_a, kind_b = _capsule_fallback(sa.kind, sb.kind)
    if (kind_a, kind_b) == ("sphere", "halfspace"):
        return _sphere_halfspace(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("box", "halfspace"):
        return _box_halfspace(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("capsule", "halfspace"):
        return _capsule_halfspace(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "sphere"):
        return _sphere_sphere(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "box"):
        return _sphere_box(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("box", "box"):
        return _box_box(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("capsule", "box"):
        return _capsule_box(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("capsule", "capsule"):
        return _capsule_capsule(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "capsule"):
        return _sphere_capsule(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("convex", "halfspace"):
        return _convex_halfspace(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "convex"):
        return _sphere_convex(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("convex", "convex"):
        return _convex_convex(sa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("convex", "box"):
        return _convex_box(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "heightmap"):
        return _sphere_heightmap(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("box", "heightmap"):
        return _box_heightmap(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("capsule", "heightmap"):
        return _capsule_heightmap(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("convex", "heightmap"):
        return _convex_heightmap(sa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("cylinder", "halfspace"):
        return _cylinder_halfspace(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "cylinder"):
        return _sphere_cylinder(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("cone", "halfspace"):
        return _cone_halfspace(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "cone"):
        return _sphere_cone(pa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("trimesh", "halfspace"):
        return _trimesh_halfspace(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "trimesh"):
        return _sphere_trimesh(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("trimesh", "trimesh"):
        return _trimesh_trimesh(sa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("trimesh", "box"):
        return _trimesh_box(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("pointcloud", "halfspace"):
        return _pointcloud_halfspace(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "pointcloud"):
        return _sphere_pointcloud(pa, sb, Ta, Tb)
    if (kind_a, kind_b) == ("pointcloud", "box"):
        return _pointcloud_box(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("linesegment", "halfspace"):
        return _linesegment_halfspace(sa, pb, Ta, Tb)
    if (kind_a, kind_b) == ("sphere", "linesegment"):
        return _sphere_linesegment(pa, sb, Ta, Tb)
    raise ValueError(f"unsupported pair {kind_a}/{kind_b}")


def _halfspace_world(pb, Tb: Transform):
    """Halfspace params [nx,ny,nz,offset] in shape frame -> world (n, d) with
    plane {x : n·x = d}, solid below."""
    n_local = pb[:3]
    n_w = Tb.rotate(n_local)
    d_w = pb[3] + jnp.dot(n_w, Tb.p)
    return n_w, d_w


def _sphere_halfspace(pa, pb, Ta, Tb):
    n, d = _halfspace_world(pb, Tb)
    c = Ta.p
    r = pa[0]
    dist = jnp.dot(n, c) - d
    depth = r - dist
    point = c - n * (r - 0.5 * depth)
    return [point], [n], [depth]


def _box_halfspace(pa, pb, Ta, Tb):
    n, d = _halfspace_world(pb, Tb)
    corners = _box_corners(pa)               # (8,3) local
    pts, ns, ds = [], [], []
    for k in range(8):
        p_w = Ta.apply(corners[k])
        depth = d - jnp.dot(n, p_w)
        pts.append(p_w)
        ns.append(n)
        ds.append(depth)
    return pts, ns, ds


def _capsule_halfspace(pa, pb, Ta, Tb):
    n, d = _halfspace_world(pb, Tb)
    r, h = pa[0], pa[1]
    pts, ns, ds = [], [], []
    for sign in (-1.0, 1.0):
        end = Ta.apply(jnp.asarray([0.0, 0.0, sign * h / 2.0], dtype=pa.dtype))
        dist = jnp.dot(n, end) - d
        depth = r - dist
        pts.append(end - n * (r - 0.5 * depth))
        ns.append(n)
        ds.append(depth)
    return pts, ns, ds


def _sphere_sphere(pa, pb, Ta, Tb):
    ra, rb = pa[0], pb[0]
    delta = Ta.p - Tb.p
    dist_sq = jnp.dot(delta, delta)
    dist = jnp.sqrt(jnp.maximum(dist_sq, 1e-18))
    n = delta / dist                           # B -> A
    depth = ra + rb - dist
    point = Tb.p + n * (rb - 0.5 * depth)
    return [point], [n], [depth]


def _vertex_in_box(v_w: jax.Array, half: jax.Array, Tb: Transform):
    """Depth/normal of a world point vs a box: penetration = min face
    distance, normal = that face's outward normal (world, pointing OUT of
    the box). Negative depth when outside (per-axis min carries the sign)."""
    local = Tb.inverse().apply(v_w)
    d = half - jnp.abs(local)                 # (3,) positive inside
    axis = jnp.argmin(d)
    depth = jnp.min(d)
    e = jax.nn.one_hot(axis, 3, dtype=v_w.dtype)
    n_local = e * jnp.sign(local[axis])
    return depth, Tb.rotate(n_local)


def _box_box(pa, pb, Ta, Tb):
    """Vertex-face contacts both directions (16 slots) + edge-edge SAT
    contacts (9 slots, one per cross-axis pair). The reference's box-box
    uses ODE-style SAT face clipping with edge-edge cases
    (`DARTCollide.hpp:79`); here vertex-in-box slots cover the face cases
    with a fully differentiable closed form, and the 9 edge slots cover
    crossings where no vertex penetrates (e.g. two bars forming an X).
    An edge slot fires only when its cross axis is (within an ODE-style
    5% fudge) the minimal separating axis, so resting face stacks keep
    being resolved by the vertex slots."""
    half_a, half_b = pa[:3] / 2.0, pb[:3] / 2.0
    pts, ns, ds = [], [], []
    ca = _box_corners(pa)
    for k in range(8):
        v_w = Ta.apply(ca[k])
        depth, n_out = _vertex_in_box(v_w, half_b, Tb)
        # normal must point from B into A: vertex of A inside B pushes A
        # out along B's outward face normal.
        pts.append(v_w)
        ns.append(n_out)
        ds.append(depth)
    cb = _box_corners(pb)
    for k in range(8):
        v_w = Tb.apply(cb[k])
        depth, n_out = _vertex_in_box(v_w, half_a, Ta)
        pts.append(v_w)
        ns.append(-n_out)  # B's vertex in A: push B along −(A's outward)
        ds.append(depth)
    e_pts, e_ns, e_ds = _box_box_edges(half_a, half_b, Ta, Tb)
    return pts + e_pts, ns + e_ns, ds + e_ds


def _box_box_edges(half_a, half_b, Ta: Transform, Tb: Transform):
    """9 edge-edge SAT slots for a box pair. For each axis pair (i, j) the
    candidate normal is cross(ua_i, ub_j); SAT overlap along it gives the
    depth; the contact point is the midpoint of the closest points of the
    two supporting edges. Active only when penetrating AND the cross axis
    beats every face axis (the reference's ODE SAT uses the same
    face-preferring fudge — `DARTCollide` via ODE dBoxBox)."""
    dtype = half_a.dtype
    ua = [Ta.R[:, k] for k in range(3)]
    ub = [Tb.R[:, k] for k in range(3)]
    d_ab = Ta.p - Tb.p

    def _overlap(axis):
        ra = sum(half_a[k] * jnp.abs(jnp.dot(axis, ua[k])) for k in range(3))
        rb = sum(half_b[k] * jnp.abs(jnp.dot(axis, ub[k])) for k in range(3))
        return ra + rb - jnp.abs(jnp.dot(axis, d_ab))

    min_face = jnp.minimum(
        jnp.min(jnp.stack([_overlap(ua[k]) for k in range(3)])),
        jnp.min(jnp.stack([_overlap(ub[k]) for k in range(3)])),
    )

    # First pass: per-pair axis, overlap, supporting-edge closest points.
    axes, depths, parallels, cps = [], [], [], []
    for i in range(3):
        for j in range(3):
            n_raw = jnp.cross(ua[i], ub[j])
            length = jnp.sqrt(jnp.maximum(jnp.dot(n_raw, n_raw), 1e-18))
            parallel = length < 1e-6
            n = n_raw / jnp.maximum(length, 1e-9)
            # orient B -> A
            n = n * jnp.where(jnp.dot(n, d_ab) >= 0.0, 1.0, -1.0)
            depth = _overlap(n)
            # supporting edge of A in the -n direction (its material is
            # deepest toward B), of B in the +n direction.
            ea_c = Ta.p + sum(
                -jnp.sign(jnp.dot(n, ua[k])) * half_a[k] * ua[k]
                for k in range(3) if k != i
            )
            eb_c = Tb.p + sum(
                jnp.sign(jnp.dot(n, ub[k])) * half_b[k] * ub[k]
                for k in range(3) if k != j
            )
            pa0 = ea_c - half_a[i] * ua[i]
            pb0 = eb_c - half_b[j] * ub[j]
            cpa, cpb = _segment_closest_points(
                pa0, 2.0 * half_a[i] * ua[i], pb0, 2.0 * half_b[j] * ub[j]
            )
            axes.append(n)
            depths.append(depth)
            parallels.append(parallel)
            cps.append((cpa, cpb))

    # SAT: penetration only if EVERY axis (6 face + 9 edge) overlaps; an
    # edge slot fires only when its axis is (within an ODE-style 5% fudge)
    # the globally minimal one AND its supporting edges actually meet there
    # (closest-point gap ~ depth) — otherwise a far-apart edge pair can
    # share the minimal axis direction and emit a phantom contact.
    edge_depths = jnp.stack(depths)
    edge_valid_depths = jnp.where(
        jnp.stack(parallels), jnp.inf, edge_depths)
    min_all = jnp.minimum(min_face, jnp.min(edge_valid_depths))

    pts, ns, ds = [], [], []
    for k in range(9):
        cpa, cpb = cps[k]
        gap = jnp.sqrt(jnp.maximum(jnp.sum((cpa - cpb) ** 2), 1e-18))
        depth = depths[k]
        valid = (
            jnp.logical_not(parallels[k])
            & (min_all > 0.0)
            & (depth <= min_all * 1.05 + 1e-6)
            & (gap <= depth * 1.5 + 1e-3)
        )
        masked = jnp.where(valid, depth, -jnp.abs(depth) - 1.0)
        pts.append(0.5 * (cpa + cpb))
        ns.append(axes[k])
        ds.append(masked.astype(dtype))
    return pts, ns, ds


def _capsule_box(pa, pb, Ta, Tb):
    """Capsule (A) end-spheres vs box (B): 2 sphere-box style slots."""
    r, h = pa[0], pa[1]
    half = pb[:3] / 2.0
    pts, ns, ds = [], [], []
    for sign in (-1.0, 1.0):
        end_w = Ta.apply(jnp.asarray([0.0, 0.0, sign * h / 2.0], dtype=pa.dtype))
        c_local = Tb.inverse().apply(end_w)
        closest = jnp.clip(c_local, -half, half)
        delta = c_local - closest
        dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
        outside = dist > 1e-9
        # outside: usual sphere-box; (deeply) inside: fall back to face push
        depth_in, n_in = _vertex_in_box(end_w, half, Tb)
        n_out = Tb.rotate(delta / dist)
        depth = jnp.where(outside, r - dist, r + depth_in)
        n = jnp.where(outside, n_out, n_in)
        pts.append(Tb.apply(closest))
        ns.append(n)
        ds.append(depth)
    return pts, ns, ds


def _segment_closest_points(p1, d1, p2, d2):
    """Closest points between segments p1+s*d1, p2+t*d2 with s,t in [0,1]
    (clamped, branch-free)."""
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    f = jnp.dot(d2, r)
    denom = jnp.maximum(a * e - b * b, 1e-12)
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), 0.0, 1.0)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    return p1 + s * d1, p2 + t * d2


def _capsule_capsule(pa, pb, Ta, Tb):
    ra, ha = pa[0], pa[1]
    rb, hb = pb[0], pb[1]
    za = Ta.rotate(jnp.asarray([0.0, 0.0, 1.0], dtype=pa.dtype))
    zb = Tb.rotate(jnp.asarray([0.0, 0.0, 1.0], dtype=pb.dtype))
    a0 = Ta.p - za * (ha / 2.0)
    b0 = Tb.p - zb * (hb / 2.0)
    ca, cb = _segment_closest_points(a0, za * ha, b0, zb * hb)
    delta = ca - cb
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    n = delta / dist                                   # B -> A
    depth = ra + rb - dist
    point = cb + n * (rb - 0.5 * depth)
    return [point], [n], [depth]


def _sphere_capsule(pa, pb, Ta, Tb):
    r_s = pa[0]
    r_c, h_c = pb[0], pb[1]
    zb = Tb.rotate(jnp.asarray([0.0, 0.0, 1.0], dtype=pb.dtype))
    b0 = Tb.p - zb * (h_c / 2.0)
    d = zb * h_c
    t = jnp.clip(jnp.dot(Ta.p - b0, d) / jnp.maximum(jnp.dot(d, d), 1e-12),
                 0.0, 1.0)
    closest = b0 + t * d
    delta = Ta.p - closest
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    n = delta / dist
    depth = r_s + r_c - dist
    point = closest + n * (r_c - 0.5 * depth)
    return [point], [n], [depth]


def _sphere_box(pa, pb, Ta, Tb):
    """Sphere (A) vs box (B): closest point on box to sphere center."""
    r = pa[0]
    half = pb[:3] / 2.0
    c_local = Tb.inverse().apply(Ta.p)
    closest = jnp.clip(c_local, -half, half)
    delta = c_local - closest
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    n_local = delta / dist
    depth = r - dist
    n = Tb.rotate(n_local)
    point = Tb.apply(closest)
    return [point], [n], [depth]


def _plane_tangent_frame(n: jax.Array, ax: jax.Array):
    """(ry, rz): in-plane frame for rim contacts of an axis-`ax` solid of
    revolution against a plane with normal `n` — ry is the component of n
    perpendicular to the axis (the reference's Ry in collideCylinderPlane,
    DARTCollide.cpp:4959-4969), with a smooth fallback for axis ∥ n."""
    dt = n.dtype
    ry_raw = n - jnp.dot(n, ax) * ax
    mag = jnp.sqrt(jnp.maximum(jnp.dot(ry_raw, ry_raw), 1e-18))
    # fallback: any perpendicular to ax (pick the more orthogonal seed)
    e1 = jnp.asarray([1.0, 0.0, 0.0], dt)
    e2 = jnp.asarray([0.0, 1.0, 0.0], dt)
    seed = jnp.where(jnp.abs(ax[0]) < 0.9, e1, e2)
    alt = jnp.cross(ax, seed)
    alt = alt / jnp.sqrt(jnp.maximum(jnp.dot(alt, alt), 1e-18))
    ry = jnp.where(mag > 1e-6, ry_raw / mag, alt)
    rz = jnp.cross(ax, ry)
    return ry, rz


def _cylinder_halfspace(pa, pb, Ta, Tb):
    """Flat-capped cylinder vs plane (reference collideCylinderPlane,
    DARTCollide.cpp:4946-5029: the deepest cap-rim corner, or an edge
    midpoint on ties). TPU version: 8 static rim slots — 2 caps x 4 rim
    directions {±ry, ±rz} — and let depth clipping keep the active subset:
    one corner when tilted, a 2-point line lying on its side, a 4-point
    ring standing on a cap (the reference's single edge-midpoint/center
    contact carries the same resultant; the ring is additionally
    tip-stable)."""
    n, d = _halfspace_world(pb, Tb)
    r, h = pa[0], pa[1]
    dt = pa.dtype
    ax = Ta.rotate(jnp.asarray([0.0, 0.0, 1.0], dt))
    ry, rz = _plane_tangent_frame(n, ax)
    pts, ns, ds = [], [], []
    for s in (-1.0, 1.0):
        cap = Ta.p + ax * (s * h / 2.0)
        for dvec in (ry, -ry, rz, -rz):
            p = cap + r * dvec
            pts.append(p)
            ns.append(n)
            ds.append(d - jnp.dot(n, p))
    return pts, ns, ds


def _sphere_cylinder(pa, pb, Ta, Tb):
    """Sphere (A) vs flat-capped cylinder (B): closest point on the solid
    cylinder (reference collideCylinderSphere, DARTCollide.cpp:4863-4944 —
    cap, rim and side cases; here unified as one branch-free closest-point
    computation, with the center-inside case pushed out the nearer
    surface)."""
    r_s = pa[0]
    r_c, h_c = pb[0], pb[1]
    dt = pa.dtype
    c = Tb.inverse().apply(Ta.p)
    rad = jnp.sqrt(jnp.maximum(c[0] ** 2 + c[1] ** 2, 1e-18))
    ez = jnp.asarray([0.0, 0.0, 1.0], dt)
    dirxy = jnp.stack([c[0] / rad, c[1] / rad, jnp.zeros((), dt)])
    inside = (rad < r_c) & (jnp.abs(c[2]) < h_c / 2.0)
    closest_out = dirxy * jnp.minimum(rad, r_c) + ez * jnp.clip(
        c[2], -h_c / 2.0, h_c / 2.0
    )
    closest_rad = dirxy * r_c + ez * c[2]
    closest_axl = dirxy * rad + ez * (jnp.sign(c[2]) * h_c / 2.0)
    closest_in = jnp.where(
        (r_c - rad) < (h_c / 2.0 - jnp.abs(c[2])), closest_rad, closest_axl
    )
    closest = jnp.where(inside, closest_in, closest_out)
    delta = c - closest
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    n_local = jnp.where(inside, -delta / dist, delta / dist)
    depth = jnp.where(inside, r_s + dist, r_s - dist)
    n = Tb.rotate(n_local)
    point = Tb.apply(closest)
    return [point], [n], [depth]


def _cone_halfspace(pa, pb, Ta, Tb):
    """Cone (base radius r at z=-h/2, apex at z=+h/2 — DART ConeShape) vs
    plane: apex slot + 4 base-rim slots {±ry, ±rz}; clipping keeps the
    active manifold (apex tip-down, one rim point tilted, a rim ring
    base-down)."""
    n, d = _halfspace_world(pb, Tb)
    r, h = pa[0], pa[1]
    dt = pa.dtype
    ax = Ta.rotate(jnp.asarray([0.0, 0.0, 1.0], dt))
    ry, rz = _plane_tangent_frame(n, ax)
    apex = Ta.p + ax * (h / 2.0)
    base = Ta.p - ax * (h / 2.0)
    pts = [apex] + [base + r * dvec for dvec in (ry, -ry, rz, -rz)]
    return pts, [n] * 5, [d - jnp.dot(n, p) for p in pts]


def _sphere_cone(pa, pb, Ta, Tb):
    """Sphere (A) vs cone (B): exact closest point on the solid of
    revolution — 2-D point-to-triangle in (radial, axial) coordinates
    (triangle: apex (0, h/2), rim (r, -h/2), base center (0, -h/2))."""
    r_s = pa[0]
    r_c, h_c = pb[0], pb[1]
    dt = pa.dtype
    c = Tb.inverse().apply(Ta.p)
    rad = jnp.sqrt(jnp.maximum(c[0] ** 2 + c[1] ** 2, 1e-18))
    dirxy = jnp.stack([c[0] / rad, c[1] / rad, jnp.zeros((), dt)])
    p2 = jnp.stack([rad, c[2]])
    apex2 = jnp.stack([jnp.zeros((), dt), h_c / 2.0])
    rim2 = jnp.stack([r_c, -h_c / 2.0])
    cen2 = jnp.stack([jnp.zeros((), dt), -h_c / 2.0])

    def seg_closest(a, b):
        ab = b - a
        t = jnp.clip(
            jnp.dot(p2 - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-18),
            0.0, 1.0,
        )
        return a + t * ab

    c_lat = seg_closest(apex2, rim2)   # lateral surface
    c_base = seg_closest(rim2, cen2)   # base disc edge-to-center
    d_lat = jnp.dot(p2 - c_lat, p2 - c_lat)
    d_base = jnp.dot(p2 - c_base, p2 - c_base)
    c2 = jnp.where(d_lat < d_base, c_lat, c_base)
    ez = jnp.asarray([0.0, 0.0, 1.0], dt)
    closest = dirxy * c2[0] + ez * c2[1]
    delta = c - closest
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    # center-inside handling (advisor r3): inside the solid, delta points
    # INTO the cone — flip the normal and report full penetration
    # r_s + dist, mirroring _sphere_cylinder's inside branch.  Inside test
    # in (radial, axial) coords: above the base plane and below the
    # lateral edge rad <= r_c * (h/2 - z) / h.
    inside = (c[2] > -h_c / 2.0) & (
        rad <= r_c * (h_c / 2.0 - c[2]) / jnp.maximum(h_c, 1e-18)
    )
    sgn = jnp.where(inside, -1.0, 1.0)
    n = Tb.rotate(sgn * delta / dist)
    depth = jnp.where(inside, r_s + dist, r_s - dist)
    point = Tb.apply(closest)
    return [point], [n], [depth]


# ---------------------------------------------------------------------------
# Convex hulls (mesh shapes). Reference: convex meshes through libccd GJK/MPR
# (`DARTCollide.hpp:42,295-302`). The TPU formulation replaces pivoting GJK
# with fixed-shape tensor tests over the hull's (V,3) vertex and (F,4) face
# tables (see utils/mesh.py): vertex-vs-hull depth is a (V x F) matrix op,
# sphere projection is a fixed-iteration Frank-Wolfe — all differentiable.
# ---------------------------------------------------------------------------


def _apply_batch(T: Transform, pts: jax.Array) -> jax.Array:
    return pts @ T.R.T + T.p


_TIE_EPS = 1e-6


def _topk_slots(depths, points, normals, k):
    """Select the k deepest candidate slots by k rounds of masked
    max-reduction + one-hot contraction — gather/top_k-free, so hull
    narrow phases run inside the fused lane kernels (round-5 verdict #4;
    the round-4 `top_k` + traced-index gather kept every mesh-collider
    model off the fused planner path, BIGMODEL_STUDY.md wall 1).

    Ties are broken lowest-index-first by a tiny static iota bias —
    matching `jax.lax.top_k`'s stable order — and the reported depth is
    the exact unbiased value (the bias only picks the slot). Values stay
    differentiable through the one-hot contraction exactly as they were
    through the gather."""
    d = depths
    iota = jnp.arange(d.shape[0], dtype=d.dtype)
    tb = d - iota * _TIE_EPS
    sel = jnp.zeros_like(d)
    pts_out, ns_out, vals = [], [], []
    neg = jnp.asarray(-1e30, d.dtype)
    for _ in range(k):
        dm = jnp.where(sel > 0, neg, tb)
        oh = (dm >= jnp.max(dm)).astype(d.dtype)
        oh = oh / jnp.maximum(jnp.sum(oh), 1.0)
        pts_out.append(oh @ points)
        ns_out.append(oh @ normals)
        vals.append(jnp.sum(oh * d))
        sel = sel + oh
    return pts_out, ns_out, vals


def _vertices_in_hull(v_local: jax.Array, faces: jax.Array):
    """Depth & outward face normal for each point vs a hull, in hull frame.
    faces: (F,4) with n·x + d <= 0 inside. depth > 0 means inside; when
    outside, depth = −(max violation) so top_k still ranks correctly.
    The worst-face normal comes from a tie-broken one-hot contraction
    (argmax + gather is not lane-evaluable)."""
    s = v_local @ faces[:, :3].T + faces[:, 3]         # (V,F), <=0 inside
    iota = jnp.arange(s.shape[1], dtype=s.dtype)
    tbf = s - iota * _TIE_EPS
    oh = (tbf >= jnp.max(tbf, axis=1, keepdims=True)).astype(s.dtype)
    oh = oh / jnp.maximum(jnp.sum(oh, axis=1, keepdims=True), 1.0)
    worst = jnp.sum(oh * s, axis=1)                     # (V,)
    return -worst, oh @ faces[:, :3]


def _convex_halfspace(sa, pb, Ta, Tb):
    """Top-6 deepest hull vertices vs the plane."""
    n, d = _halfspace_world(pb, Tb)
    v_w = _apply_batch(Ta, jnp.asarray(sa.vertices, dtype=Ta.p.dtype))
    depths = d - v_w @ n                                # (V,)
    ns = jnp.broadcast_to(n, v_w.shape)
    return _topk_slots(depths, v_w, ns, 6)


def _sphere_convex(pa, sb, Ta, Tb):
    """Sphere (A) vs hull (B): project the center onto the hull with a
    fixed-iteration Frank-Wolfe over the vertex polytope (support calls are
    one (V,3)·(3,) matvec each); deep-inside case falls back to the closest
    face plane."""
    r = pa[0]
    verts = jnp.asarray(sb.vertices, dtype=Ta.p.dtype)  # hull-local (V,3)
    faces = jnp.asarray(sb.faces, dtype=Ta.p.dtype)
    c = Tb.inverse().apply(Ta.p)
    iota_v = jnp.arange(verts.shape[0], dtype=verts.dtype)

    def fw(x):
        g = c - x
        # support vertex via tie-broken one-hot (argmax + gather is not
        # lane-evaluable); the iteration loop is a Python unroll for the
        # same reason (lax.scan is control flow the lane kernels reject)
        sc = verts @ g - iota_v * _TIE_EPS
        oh = (sc >= jnp.max(sc)).astype(verts.dtype)
        s = (oh / jnp.maximum(jnp.sum(oh), 1.0)) @ verts
        dx = s - x
        gamma = jnp.clip(
            jnp.dot(g, dx) / jnp.maximum(jnp.dot(dx, dx), 1e-12), 0.0, 1.0
        )
        return x + gamma * dx

    x = jnp.mean(verts, axis=0)
    for _ in range(32):
        x = fw(x)
    s_face = faces[:, :3] @ c + faces[:, 3]             # signed plane dists
    s_max = jnp.max(s_face)
    iota_f = jnp.arange(faces.shape[0], dtype=faces.dtype)
    oh_f = ((s_face - iota_f * _TIE_EPS)
            >= jnp.max(s_face - iota_f * _TIE_EPS)).astype(faces.dtype)
    n_f = (oh_f / jnp.maximum(jnp.sum(oh_f), 1.0)) @ faces[:, :3]
    inside = s_max <= 0.0
    # Face-region exact answer: the foot point of the most-violated plane —
    # exact whenever that foot lies in the hull. FW converges slowly exactly
    # there (face-interior optima) but fast at vertices/edges, so use the
    # foot when valid, the FW point otherwise.
    foot = c - n_f * s_max
    foot_ok = jnp.max(faces[:, :3] @ foot + faces[:, 3]) <= 1e-9
    x = jnp.where(foot_ok, foot, x)
    delta = c - x
    dist = jnp.sqrt(jnp.maximum(jnp.dot(delta, delta), 1e-18))
    n_local = jnp.where(inside, n_f, delta / dist)
    depth = jnp.where(inside, r - s_max, r - dist)
    surf = jnp.where(inside, foot, x)
    n_w = Tb.rotate(n_local)                            # B -> A
    return [Tb.apply(surf)], [n_w], [depth]


def _convex_convex(sa, sb, Ta, Tb):
    """Vertex-in-hull both directions, 4 deepest each way (the convex
    analogue of `_box_box`; edge-edge crossings resolve through vertex
    contacts a step later, as documented there)."""
    dtype = Ta.p.dtype
    va = jnp.asarray(sa.vertices, dtype=dtype)
    vb = jnp.asarray(sb.vertices, dtype=dtype)
    fa = jnp.asarray(sa.faces, dtype=dtype)
    fb = jnp.asarray(sb.faces, dtype=dtype)
    Tab = Tb.inverse().compose(Ta)                      # A-local -> B-local
    Tba = Ta.inverse().compose(Tb)
    # A's vertices against hull B
    va_in_b = _apply_batch(Tab, va)
    d_a, n_a_local = _vertices_in_hull(va_in_b, fb)
    pts_a = _apply_batch(Tb, va_in_b)
    ns_a = n_a_local @ Tb.R.T                           # outward of B = B->A
    p1, n1, dd1 = _topk_slots(d_a, pts_a, ns_a, 4)
    # B's vertices against hull A
    vb_in_a = _apply_batch(Tba, vb)
    d_b, n_b_local = _vertices_in_hull(vb_in_a, fa)
    pts_b = _apply_batch(Ta, vb_in_a)
    ns_b = -(n_b_local @ Ta.R.T)                        # push B along −outward(A)
    p2, n2, dd2 = _topk_slots(d_b, pts_b, ns_b, 4)
    return p1 + p2, n1 + n2, dd1 + dd2


def _convex_box(sa, pb, Ta, Tb):
    """Hull (A) vertices in box (B) + box corners in hull (A), 4+4 slots."""
    dtype = Ta.p.dtype
    va = jnp.asarray(sa.vertices, dtype=dtype)
    fa = jnp.asarray(sa.faces, dtype=dtype)
    half_b = pb[:3] / 2.0
    # hull verts vs box
    v_w = _apply_batch(Ta, va)
    d_a, n_a = jax.vmap(lambda v: _vertex_in_box(v, half_b, Tb))(v_w)
    p1, n1, dd1 = _topk_slots(d_a, v_w, n_a, 4)
    # box corners vs hull
    cb = _box_corners(pb)
    cb_w = _apply_batch(Tb, cb)
    cb_a = _apply_batch(Ta.inverse(), cb_w)
    d_b, n_b_local = _vertices_in_hull(cb_a, fa)
    ns_b = -(n_b_local @ Ta.R.T)
    p2, n2, dd2 = _topk_slots(d_b, cb_w, ns_b, 4)
    return p1 + p2, n1 + n2, dd1 + dd2


# ---------------------------------------------------------------------------
# Heightmap terrain. The reference carries `HeightmapShape`
# (dart/dynamics/HeightmapShape.hpp) as geometry but its DART narrow-phase
# never implemented contact for it (upstream used fcl, removed in the fork);
# here heightmap contact is first-class and differentiable: bilinear height
# sampling + AD surface normals. Shape data: `vertices` holds the (H, W)
# height grid, params = [x0, z0, dx, dz] (grid origin/spacing, +y up, in the
# shape frame).
# ---------------------------------------------------------------------------


def _heightmap_height(hm: jax.Array, params: jax.Array, x, z):
    """Bilinearly interpolated height at local (x, z), edge-clamped."""
    H, W = hm.shape
    fx = (x - params[0]) / params[2]
    fz = (z - params[1]) / params[3]
    fx = jnp.clip(fx, 0.0, W - 1.001)
    fz = jnp.clip(fz, 0.0, H - 1.001)
    i0 = jnp.floor(fz).astype(jnp.int32)
    j0 = jnp.floor(fx).astype(jnp.int32)
    tz = fz - i0
    tx = fx - j0
    h00 = hm[i0, j0]
    h01 = hm[i0, j0 + 1]
    h10 = hm[i0 + 1, j0]
    h11 = hm[i0 + 1, j0 + 1]
    return (
        h00 * (1 - tz) * (1 - tx) + h01 * (1 - tz) * tx
        + h10 * tz * (1 - tx) + h11 * tz * tx
    )


def _point_heightmap(v_w: jax.Array, sb, Tb: Transform):
    """(depth, world normal pointing OUT of the terrain) for a world point."""
    hm = jnp.asarray(sb.vertices, dtype=v_w.dtype)
    local = Tb.inverse().apply(v_w)

    def h_at(xz):
        return _heightmap_height(hm, sb.params, xz[0], xz[1])

    xz = jnp.stack([local[0], local[2]])
    h, dh = jax.value_and_grad(h_at)(xz)
    depth = h - local[1]
    n_local = jnp.stack([-dh[0], jnp.ones((), v_w.dtype), -dh[1]])
    n_local = n_local / jnp.linalg.norm(n_local)
    return depth, Tb.rotate(n_local)


def _sphere_heightmap(pa, sb, Ta, Tb):
    r = pa[0]
    depth_c, n = _point_heightmap(Ta.p, sb, Tb)
    depth = depth_c + r             # center depth + radius
    point = Ta.p - n * (r - 0.5 * depth)
    return [point], [n], [depth]


def _box_heightmap(pa, sb, Ta, Tb):
    pts, ns, ds = [], [], []
    corners = _box_corners(pa)
    for k in range(8):
        v_w = Ta.apply(corners[k])
        depth, n = _point_heightmap(v_w, sb, Tb)
        pts.append(v_w)
        ns.append(n)
        ds.append(depth)
    return pts, ns, ds


def _capsule_heightmap(pa, sb, Ta, Tb):
    r, h = pa[0], pa[1]
    pts, ns, ds = [], [], []
    for sign in (-1.0, 1.0):
        end = Ta.apply(jnp.asarray([0.0, 0.0, sign * h / 2.0], dtype=pa.dtype))
        depth_c, n = _point_heightmap(end, sb, Tb)
        depth = depth_c + r
        pts.append(end - n * (r - 0.5 * depth))
        ns.append(n)
        ds.append(depth)
    return pts, ns, ds


def _convex_heightmap(sa, sb, Ta, Tb):
    v_w = _apply_batch(Ta, jnp.asarray(sa.vertices, dtype=Ta.p.dtype))
    d, n = jax.vmap(lambda v: _point_heightmap(v, sb, Tb))(v_w)
    return _topk_slots(d, v_w, n, 6)


# ---------------------------------------------------------------------------
# Non-convex triangle meshes, point clouds, line segments.
# Reference: DART routes meshes through libccd GJK/MPR (convex pieces) or
# ODE trimesh vertex-face/edge-edge contacts (DARTCollide.hpp:42,179);
# PointCloudShape.hpp:1 / LineSegmentShape.hpp:1. The TPU formulation is
# fixed-shape tensor tests: vertex-vs-closest-triangle signed local
# surface distance for meshes (requires consistent outward winding),
# per-point/per-endpoint sphere tests for clouds and segments. Trimesh
# tests gather triangle vertices, so trimesh worlds run on the XLA
# contact path (not inside the lane kernels).
# ---------------------------------------------------------------------------


def _tri_closest_points(p: jax.Array, a, b, c):
    """Closest point on each triangle (a[i], b[i], c[i]) to p (Ericson,
    'Real-Time Collision Detection' §5.1.5, vectorized over F)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.einsum("fi,fi->f", ab, ap)
    d2 = jnp.einsum("fi,fi->f", ac, ap)
    bp = p - b
    d3 = jnp.einsum("fi,fi->f", ab, bp)
    d4 = jnp.einsum("fi,fi->f", ac, bp)
    cp_ = p - c
    d5 = jnp.einsum("fi,fi->f", ab, cp_)
    d6 = jnp.einsum("fi,fi->f", ac, cp_)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    tiny = 1e-18
    # interior (barycentric) candidate
    denom = jnp.maximum(va + vb + vc, tiny)
    v_in = vb / denom
    w_in = vc / denom
    cand_face = a + v_in[:, None] * ab + w_in[:, None] * ac
    # edge/vertex candidates
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, tiny), 0.0, 1.0)
    cand_ab = a + t_ab[:, None] * ab
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, tiny), 0.0, 1.0)
    cand_ac = a + t_ac[:, None] * ac
    t_bc = jnp.clip(
        (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), tiny), 0.0, 1.0
    )
    cand_bc = b + t_bc[:, None] * (c - b)
    # region select (Ericson's case order)
    out = cand_face
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[:, None], cand_ab, out)
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[:, None], cand_ac, out)
    out = jnp.where(
        ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[:, None],
        cand_bc, out,
    )
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[:, None], a, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[:, None], b, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[:, None], c, out)
    return out


def _trimesh_abc(sp, dtype):
    import numpy as _np

    verts = jnp.asarray(sp.vertices, dtype=dtype)
    tris = _np.asarray(sp.faces, dtype=_np.int64)
    return verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]


def _point_vs_trimesh(p_local, a, b, c):
    """(closest_point, outward_normal, signed_dist) of p vs the mesh's
    closest triangle; signed_dist < 0 means the point is on the inner
    side of the local surface (penetrating, for outward winding)."""
    cp = _tri_closest_points(p_local, a, b, c)
    d2 = jnp.sum((p_local - cp) ** 2, axis=-1)
    k = jnp.argmin(d2)
    n = jnp.cross(b[k] - a[k], c[k] - a[k])
    n = n / jnp.sqrt(jnp.maximum(jnp.dot(n, n), 1e-18))
    dist = jnp.sqrt(jnp.maximum(d2[k], 1e-18))
    side = jnp.sign(jnp.dot(p_local - cp[k], n))
    side = jnp.where(side == 0.0, 1.0, side)
    return cp[k], n, side * dist


def _trimesh_halfspace(sa, pb, Ta, Tb):
    """Top-6 deepest mesh vertices vs the plane."""
    n, d = _halfspace_world(pb, Tb)
    v_w = _apply_batch(Ta, jnp.asarray(sa.vertices, dtype=Ta.p.dtype))
    depths = d - v_w @ n
    ns = jnp.broadcast_to(n, v_w.shape)
    return _topk_slots(depths, v_w, ns, 6)


def _sphere_trimesh(pa, sb, Ta, Tb):
    """Sphere center vs closest triangle of the (non-convex) mesh."""
    r = pa[0]
    a, b, c = _trimesh_abc(sb, Ta.p.dtype)
    cl = Tb.inverse().apply(Ta.p)
    cp, n, sd = _point_vs_trimesh(cl, a, b, c)
    # sd > 0: outside the local surface, depth = r - sd; sd < 0: center
    # below the surface, full penetration r + |sd| with the outward normal
    depth = r - sd
    return [Tb.apply(cp)], [Tb.rotate(n)], [depth]


def _verts_vs_trimesh(v_local, a, b, c):
    f = jax.vmap(lambda p: _point_vs_trimesh(p, a, b, c))
    cps, ns, sds = f(v_local)
    return cps, ns, -sds          # depth > 0 when inside


def _trimesh_trimesh(sa, sb, Ta, Tb):
    """NON-convex mesh-mesh: vertex vs closest-triangle signed surface
    distance, both directions, 4 deepest each way (the ODE-trimesh
    vertex-face role; edge-edge crossings resolve through vertex contacts
    a step later, as for _box_box)."""
    dtype = Ta.p.dtype
    va = jnp.asarray(sa.vertices, dtype=dtype)
    vb = jnp.asarray(sb.vertices, dtype=dtype)
    ab_, bb_, cb_ = _trimesh_abc(sb, dtype)
    aa_, ba_, ca_ = _trimesh_abc(sa, dtype)
    Tab = Tb.inverse().compose(Ta)
    Tba = Ta.inverse().compose(Tb)
    # A's vertices against mesh B
    va_in_b = _apply_batch(Tab, va)
    cps_a, ns_a, d_a = _verts_vs_trimesh(va_in_b, ab_, bb_, cb_)
    p1, n1, dd1 = _topk_slots(
        d_a, _apply_batch(Tb, va_in_b), ns_a @ Tb.R.T, 4
    )
    # B's vertices against mesh A (normal flipped: push B along −outward(A))
    vb_in_a = _apply_batch(Tba, vb)
    cps_b, ns_b, d_b = _verts_vs_trimesh(vb_in_a, aa_, ba_, ca_)
    p2, n2, dd2 = _topk_slots(
        d_b, _apply_batch(Ta, vb_in_a), -(ns_b @ Ta.R.T), 4
    )
    return p1 + p2, n1 + n2, dd1 + dd2


def _trimesh_box(sa, pb, Ta, Tb):
    """Mesh vertices in box + box corners vs mesh surface, 4+4 slots."""
    dtype = Ta.p.dtype
    va = jnp.asarray(sa.vertices, dtype=dtype)
    half_b = pb[:3] / 2.0
    v_w = _apply_batch(Ta, va)
    d_a, n_a = jax.vmap(lambda v: _vertex_in_box(v, half_b, Tb))(v_w)
    p1, n1, dd1 = _topk_slots(d_a, v_w, n_a, 4)
    aa_, ba_, ca_ = _trimesh_abc(sa, dtype)
    cb_w = _apply_batch(Tb, _box_corners(pb))
    cb_a = _apply_batch(Ta.inverse(), cb_w)
    _, ns_b, d_b = _verts_vs_trimesh(cb_a, aa_, ba_, ca_)
    p2, n2, dd2 = _topk_slots(d_b, cb_w, -(ns_b @ Ta.R.T), 4)
    return p1 + p2, n1 + n2, dd1 + dd2


def _topk_slots_padded(depths, points, normals, k):
    """_topk_slots that tolerates fewer than k candidates (small point
    clouds / short segment lists): pads with never-active dummies."""
    n_c = depths.shape[0]
    if n_c < k:
        pad = k - n_c
        depths = jnp.concatenate(
            [depths, jnp.full((pad,), -1e20, depths.dtype)]
        )
        points = jnp.concatenate(
            [points, jnp.zeros((pad, 3), points.dtype)]
        )
        normals = jnp.concatenate(
            [normals, jnp.tile(jnp.asarray([0.0, 1.0, 0.0],
                                           normals.dtype), (pad, 1))]
        )
    return _topk_slots(depths, points, normals, k)


def _pointcloud_halfspace(sa, pb, Ta, Tb):
    """Each cloud point is a sphere of radius params[0]; top-6 deepest."""
    n, d = _halfspace_world(pb, Tb)
    r = sa.params[0]
    p_w = _apply_batch(Ta, jnp.asarray(sa.vertices, dtype=Ta.p.dtype))
    depths = r + d - p_w @ n
    pts = p_w - n[None, :] * r
    ns = jnp.broadcast_to(n, p_w.shape)
    return _topk_slots_padded(depths, pts, ns, 6)


def _sphere_pointcloud(pa, sb, Ta, Tb):
    """Sphere (A) vs the nearest cloud point (a sphere of radius
    params[0])."""
    r_s = pa[0]
    r_p = sb.params[0]
    p_w = _apply_batch(Tb, jnp.asarray(sb.vertices, dtype=Ta.p.dtype))
    d2 = jnp.sum((p_w - Ta.p) ** 2, axis=-1)
    k = jnp.argmin(d2)
    delta = Ta.p - p_w[k]
    dist = jnp.sqrt(jnp.maximum(d2[k], 1e-18))
    n = delta / dist                                   # B -> A
    depth = r_s + r_p - dist
    return [p_w[k] + n * (r_p - 0.5 * depth)], [n], [depth]


def _pointcloud_box(sa, pb, Ta, Tb):
    """Cloud points (spheres) vs box: 4 deepest per-point sphere-box."""
    r = sa.params[0]
    half_b = pb[:3] / 2.0
    p_w = _apply_batch(Ta, jnp.asarray(sa.vertices, dtype=Ta.p.dtype))
    d_c, n_c = jax.vmap(lambda v: _vertex_in_box(v, half_b, Tb))(p_w)
    return _topk_slots_padded(d_c + r, p_w, n_c, 4)


def _linesegment_halfspace(sa, pb, Ta, Tb):
    """Segment endpoints as thin capsules of radius params[0]; top-4."""
    n, d = _halfspace_world(pb, Tb)
    r = sa.params[0]
    segs = jnp.asarray(sa.vertices, dtype=Ta.p.dtype)    # (S, 2, 3)
    ends = segs.reshape(-1, 3)
    e_w = _apply_batch(Ta, ends)
    depths = r + d - e_w @ n
    pts = e_w - n[None, :] * r
    ns = jnp.broadcast_to(n, e_w.shape)
    return _topk_slots_padded(depths, pts, ns, 4)


def _sphere_linesegment(pa, sb, Ta, Tb):
    """Sphere vs the closest point on the closest segment (thin
    capsule)."""
    r_s = pa[0]
    r_l = sb.params[0]
    segs = jnp.asarray(sb.vertices, dtype=Ta.p.dtype)    # (S, 2, 3)
    c = Tb.inverse().apply(Ta.p)

    def seg_closest(seg):
        a, b = seg[0], seg[1]
        ab = b - a
        t = jnp.clip(
            jnp.dot(c - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-18),
            0.0, 1.0,
        )
        return a + t * ab

    cps = jax.vmap(seg_closest)(segs)                    # (S, 3)
    d2 = jnp.sum((cps - c) ** 2, axis=-1)
    k = jnp.argmin(d2)
    delta = c - cps[k]
    dist = jnp.sqrt(jnp.maximum(d2[k], 1e-18))
    n = Tb.rotate(delta / dist)
    depth = r_s + r_l - dist
    return [Tb.apply(cps[k])], [n], [depth]

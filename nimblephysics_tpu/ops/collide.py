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


def _num_slots(kind_a: str, kind_b: str) -> int:
    pair = (kind_a, kind_b)
    table = {
        ("sphere", "halfspace"): 1,
        ("box", "halfspace"): 8,
        ("capsule", "halfspace"): 2,
        ("sphere", "sphere"): 1,
        ("sphere", "box"): 1,
        ("box", "box"): 16,
        ("capsule", "box"): 2,
        ("capsule", "capsule"): 1,
        ("sphere", "capsule"): 1,
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
        ps, ns, ds = _narrow_phase(sa.kind, sb.kind, sa.params, sb.params, Ta, Tb)
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


def _narrow_phase(kind_a, kind_b, pa, pb, Ta: Transform, Tb: Transform):
    """Dispatch on (static) kinds; returns lists of (point, normal, depth)."""
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
    """Vertex-face contacts both directions (16 slots). The reference's
    box-box uses ODE-style SAT face clipping (`DARTCollide.hpp:79`); the
    vertex-in-box formulation gives the same resting/stacking contact sets
    with a fully differentiable closed form. Edge-edge crossings are not
    generated (deep edge-on-edge impacts resolve one step later through
    vertex contacts)."""
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

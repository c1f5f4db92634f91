"""Small end-user helpers from the reference python package
(python/nimblephysics/{get_height,get_lowest_point}.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.collide import _box_corners


def _shape_extremes_y(model: Model, q: jax.Array):
    """World y of every collision-shape support point (approximate: shape
    centers +- bounding radius; box corners exactly)."""
    kin = dyn.forward_kinematics(model, q)
    ys = []
    for shape in model.shapes:
        if shape.body_index < 0:
            continue
        T = kin.T_wb[shape.body_index].compose(shape.offset)
        p = shape.params
        if shape.kind == "box":
            for k in range(8):
                ys.append(T.apply(_box_corners(p)[k])[1])
        elif shape.kind == "sphere":
            ys.extend([T.p[1] - p[0], T.p[1] + p[0]])
        elif shape.kind == "capsule":
            for sign in (-1.0, 1.0):
                end = T.apply(jnp.asarray([0.0, 0.0, sign * p[1] / 2], q.dtype))
                ys.extend([end[1] - p[0], end[1] + p[0]])
    if not ys:
        # fall back to body origins
        ys = [kin.T_wb[i].p[1] for i in range(model.num_bodies)]
    return jnp.stack(ys)


def get_height(model: Model, q: jax.Array) -> jax.Array:
    """Vertical extent of the model at pose q (`get_height.py`)."""
    ys = _shape_extremes_y(model, q)
    return jnp.max(ys) - jnp.min(ys)


def get_lowest_point(model: Model, q: jax.Array) -> jax.Array:
    """Lowest world y of any collision shape (`get_lowest_point.py`) —
    used to drop models onto the ground."""
    return jnp.min(_shape_extremes_y(model, q))

"""Differentiable body scaling — the reference's body-scale groups
(`WithRespectTo::GROUP_SCALES`, Skeleton body scaling used throughout
MarkerFitter).

Scaling body i by s_i (3,) in its own frame:
  * its COM offset scales: com_i <- s_i * com_i
  * its moment of inertia scales with the geometry (box-law per axis:
    I_xx ~ (s_y² + s_z²)/2 relative growth — the reference rescales
    inertia from shape dimensions; this is the same law for its
    primitive shapes)
  * child joint attachment points on it scale: T_pj.p of children
  * its own joint's child-side offset T_cj.p scales in child frame
  * markers attached to it scale their offsets (handled by MarkerSet)

Masses are deliberately NOT scaled (mass is its own parameter axis —
GROUP_MASSES), matching the reference's separation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops.lie import Transform


def scale_bodies(model: Model, scales: jax.Array) -> Model:
    """scales: (nb, 3) per-body xyz scale factors. Returns a new Model."""
    nb = model.num_bodies
    com = model.com * scales

    # inertia: per-axis quadratic growth (I_xx picks up s_y, s_z etc.)
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    factors = jnp.stack(
        [
            jnp.stack([sy * sz, sx * sy, sx * sz], axis=-1),
            jnp.stack([sx * sy, sx * sz, sy * sz], axis=-1),
            jnp.stack([sx * sz, sy * sz, sx * sy], axis=-1),
        ],
        axis=-2,
    )
    # diagonal terms: I_xx ~ s_y s_z growth is the volume-preserving-ish
    # approximation; use the standard primitive law I_ii' = I_ii * (s_j^2 +
    # s_k^2) / 2 normalized at s=1:
    s2 = scales * scales
    diag_growth = jnp.stack(
        [
            (s2[:, 1] + s2[:, 2]) / 2.0,
            (s2[:, 0] + s2[:, 2]) / 2.0,
            (s2[:, 0] + s2[:, 1]) / 2.0,
        ],
        axis=-1,
    )
    off_growth = jnp.stack(
        [
            jnp.stack([diag_growth[:, 0], sx * sy, sx * sz], axis=-1),
            jnp.stack([sx * sy, diag_growth[:, 1], sy * sz], axis=-1),
            jnp.stack([sx * sz, sy * sz, diag_growth[:, 2]], axis=-1),
        ],
        axis=-2,
    )
    del factors
    moment = model.moment * off_growth

    # child joints attached to body p scale their parent-frame offsets
    parent_scale = jnp.stack(
        [
            scales[model.parents[i]] if model.parents[i] >= 0
            else jnp.ones(3, dtype=scales.dtype)
            for i in range(nb)
        ]
    )
    T_pj = Transform(model.T_pj.R, model.T_pj.p * parent_scale)
    # each joint's child-side offset scales with the CHILD body's scale
    T_cj = Transform(model.T_cj.R, model.T_cj.p * scales)

    return model.replace(com=com, moment=moment, T_pj=T_pj, T_cj=T_cj)

"""Markers & IK error reporting (dart/dynamics/Marker,
dart/biomechanics/IKErrorReport)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


@dataclasses.dataclass(frozen=True)
class MarkerSet:
    """Named body-fixed markers: names[i] sits on body_indices[i] at
    offsets[i] (body-frame). Offsets are a differentiable leaf so the
    fitter can optimize them (the reference's marker-offset variables)."""

    names: Tuple[str, ...]
    body_indices: Tuple[int, ...]
    offsets: jax.Array  # (n_markers, 3)

    def with_offsets(self, offsets: jax.Array) -> "MarkerSet":
        return dataclasses.replace(self, offsets=offsets)

    def scaled(self, scales: jax.Array) -> "MarkerSet":
        """Scale offsets with their body's scale (nb, 3)."""
        per_marker = jnp.stack([scales[b] for b in self.body_indices])
        return self.with_offsets(self.offsets * per_marker)


jax.tree_util.register_pytree_node(
    MarkerSet,
    lambda ms: ((ms.offsets,), (ms.names, ms.body_indices)),
    lambda aux, leaves: MarkerSet(aux[0], aux[1], leaves[0]),
)


def marker_world_positions(
    model: Model, markers: MarkerSet, q: jax.Array
) -> jax.Array:
    """(n_markers, 3) world positions at configuration q."""
    kin = dyn.forward_kinematics(model, q)
    return jnp.stack(
        [
            kin.T_wb[b].apply(markers.offsets[i])
            for i, b in enumerate(markers.body_indices)
        ]
    )


class IKErrorReport:
    """Marker-error statistics over a trial (IKErrorReport.cpp)."""

    def __init__(self, model: Model, markers: MarkerSet, qs: jax.Array,
                 observed: jax.Array, observed_mask=None):
        pred = jax.vmap(lambda q: marker_world_positions(model, markers, q))(qs)
        err = np.asarray(pred) - np.asarray(observed)
        dist = np.linalg.norm(err, axis=-1)  # (T, n_markers)
        if observed_mask is not None:
            mask = np.asarray(observed_mask, dtype=bool)
            dist = np.where(mask, dist, np.nan)
        self.per_frame_rmse = np.sqrt(np.nanmean(dist**2, axis=1))
        self.root_mean_squared_error = float(np.sqrt(np.nanmean(dist**2)))
        self.average_error = float(np.nanmean(dist))
        self.max_error = float(np.nanmax(dist))
        self.per_marker_error: Dict[str, float] = {
            markers.names[i]: float(np.nanmean(dist[:, i]))
            for i in range(len(markers.names))
        }

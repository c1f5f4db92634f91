"""LilypadSolver — ground-contact segmentation into surface tiles.

Role parity with `dart/biomechanics/LilypadSolver.{hpp,cpp}`: scan a motion
trial for moments when designated contact bodies move slowly near the
ground, bin those moments into a 2-D tile grid perpendicular to the ground
normal ("lilypads"), and report per-tile ground-height bounds + frame
sets. Used to localize stance phases and estimate the support surface
without force plates.

Body positions/velocities come from one vmapped FK sweep (jitted); the
discrete binning is host-side NumPy (offline analysis, not a hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


@dataclasses.dataclass
class LilypadCell:
    x: int
    y: int
    ground_lower: float
    ground_upper: float
    frames: List[int]
    bodies: List[int]


class LilypadSolver:
    def __init__(
        self,
        model: Model,
        ground_contact_bodies: Sequence[int],
        ground_normal=(0.0, 1.0, 0.0),
        tile_size: float = 0.2,
        vel_threshold: float = 0.25,
        height_threshold: float = 0.12,
    ):
        self.model = model
        self.bodies = tuple(ground_contact_bodies)
        self.normal = np.asarray(ground_normal, dtype=np.float64)
        self.normal /= np.linalg.norm(self.normal)
        self.tile_size = tile_size
        self.vel_threshold = vel_threshold
        self.height_threshold = height_threshold
        # in-plane basis
        up = self.normal
        a = np.asarray([1.0, 0.0, 0.0])
        if abs(up @ a) > 0.9:
            a = np.asarray([0.0, 0.0, 1.0])
        self.e1 = np.cross(up, a)
        self.e1 /= np.linalg.norm(self.e1)
        self.e2 = np.cross(up, self.e1)
        self.cells: Dict[Tuple[int, int], LilypadCell] = {}

    def process(self, poses: jax.Array, start_time: int = 0):
        """Scan a (T, nq) pose trial and accumulate lilypads."""
        model, feet = self.model, self.bodies
        dt = float(model.dt)

        def body_pos(q):
            kin = dyn.forward_kinematics(model, q)
            return jnp.stack([kin.T_wb[f].p for f in feet])

        pos = np.asarray(jax.jit(jax.vmap(body_pos))(poses))  # (T,nf,3)
        vel = np.diff(pos, axis=0) / dt                       # (T-1,nf,3)
        heights = pos @ self.normal                           # (T,nf)
        ground_est = np.min(heights)

        for t in range(vel.shape[0]):
            for k, b in enumerate(feet):
                slow = np.linalg.norm(vel[t, k]) < self.vel_threshold
                low = heights[t, k] - ground_est < self.height_threshold
                if not (slow and low):
                    continue
                p = pos[t, k]
                ix = int(np.floor((p @ self.e1) / self.tile_size))
                iy = int(np.floor((p @ self.e2) / self.tile_size))
                cell = self.cells.get((ix, iy))
                h = float(heights[t, k])
                if cell is None:
                    cell = LilypadCell(x=ix, y=iy, ground_lower=h,
                                       ground_upper=h, frames=[], bodies=[])
                    self.cells[(ix, iy)] = cell
                cell.ground_lower = min(cell.ground_lower, h)
                cell.ground_upper = max(cell.ground_upper, h)
                cell.frames.append(start_time + t)
                if b not in cell.bodies:
                    cell.bodies.append(b)

    def get_cells(self) -> List[LilypadCell]:
        return list(self.cells.values())

    def clear(self):
        self.cells.clear()

"""Force-plate extraction from C3D files — `dart/biomechanics/
C3DForcePlatforms` / `ForcePlate.hpp`.

Reads the FORCE_PLATFORM parameter group (corners, origins, analog channel
assignments) and converts raw analog channels into world-frame forces,
moments, and centers of pressure per plate. Supports type-2/4 plates
(the common lab format: 6 channels Fx Fy Fz Mx My Mz per plate).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from nimblephysics_tpu.biomechanics.c3d import C3DFile


@dataclasses.dataclass
class ForcePlate:
    corners: np.ndarray        # (4, 3) world, meters
    origin: np.ndarray         # (3,) plate origin offset, meters
    forces: np.ndarray         # (T, 3) world frame, Newtons
    moments: np.ndarray        # (T, 3) about the plate origin, N·m
    cop: np.ndarray            # (T, 3) center of pressure, world, meters

    @property
    def center(self) -> np.ndarray:
        return self.corners.mean(axis=0)


def extract_force_plates(c3d: C3DFile) -> List[ForcePlate]:
    params = c3d.parameters or {}
    fp = params.get("FORCE_PLATFORM")
    if not fp:
        return []

    def values(name, default=None):
        return fp.get(name, {}).get("values", default)

    used = values("USED", [0])
    n_plates = int(used[0]) if used else 0
    if n_plates <= 0 or c3d.analog is None:
        return []

    ptype = values("TYPE", [2] * n_plates)
    corners_flat = np.asarray(values("CORNERS", []), dtype=np.float64)
    corners = corners_flat.reshape(n_plates, 4, 3) * 1e-3  # mm -> m
    origin_flat = np.asarray(values("ORIGIN", [0.0] * (3 * n_plates)))
    origins = origin_flat.reshape(n_plates, 3) * 1e-3
    channels = np.asarray(values("CHANNEL", []), dtype=np.int64).reshape(
        n_plates, -1
    )  # 1-based analog channel indices

    # analog scaling (ANALOG group): per-channel scale + offset + gen_scale
    ag = params.get("ANALOG", {})
    n_ch = c3d.analog.shape[1]
    scale = np.asarray(
        ag.get("SCALE", {}).get("values", [1.0] * n_ch), dtype=np.float64
    )[:n_ch]
    offset = np.asarray(
        ag.get("OFFSET", {}).get("values", [0.0] * n_ch), dtype=np.float64
    )[:n_ch]
    gen = ag.get("GEN_SCALE", {}).get("values", [1.0])
    gen_scale = float(gen[0]) if gen else 1.0

    analog = (c3d.analog - offset[None, :]) * scale[None, :] * gen_scale

    plates: List[ForcePlate] = []
    for p in range(n_plates):
        ch = channels[p] - 1
        if ch.max() >= n_ch:
            continue
        data = analog[:, ch[:6]]
        F = data[:, 0:3]
        # type 2/4 moments come in N·mm when positions are mm (the usual lab
        # convention) -> convert to N·m
        M = data[:, 3:6] * 1e-3
        center = corners[p].mean(axis=0)
        # plate z-axis from the corner plane
        v1 = corners[p][1] - corners[p][0]
        v2 = corners[p][2] - corners[p][0]
        z = np.cross(v1, v2)
        z /= max(np.linalg.norm(z), 1e-12)
        if z[1] < 0 and abs(z[1]) > abs(z[2]):
            z = -z
        # COP about the plate surface (standard type-2 formula in the plate
        # frame approximated by the world-aligned plate here)
        Fz = F[:, 2:3].copy()
        Fz[np.abs(Fz) < 1e-6] = np.inf
        cop_local = np.stack(
            [-M[:, 1] / Fz[:, 0], M[:, 0] / Fz[:, 0], np.zeros(len(F))], axis=1
        )
        cop = cop_local + center[None, :] + origins[p][None, :]
        plates.append(
            ForcePlate(
                corners=corners[p], origin=origins[p],
                forces=F, moments=M, cop=cop,
            )
        )
    return plates

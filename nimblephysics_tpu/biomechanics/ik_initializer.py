"""Closed-form IK initialization — `dart/biomechanics/IKInitializer` (4,151
LoC): estimate joint centers from marker clusters before any optimization.

Core primitive: the Gamage–Lasenby least-squares sphere fit — for markers
rigidly attached to segments on either side of a ball-ish joint, the joint
center is the point whose distance to each marker stays constant over the
trial. Linear least squares, no iteration, no initial guess.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def estimate_joint_center(marker_trajs: Sequence[np.ndarray]) -> np.ndarray:
    """Gamage–Lasenby: marker_trajs = list of (T, 3) marker paths whose
    distance to the (moving-with-segment... here assumed quasi-stationary)
    joint center is constant. Returns the (3,) center minimizing
    sum_m sum_t (||p_mt − c||² − r_m²)².

    Linear system: for each marker, subtracting the time-mean of the
    constraint eliminates r_m, giving A c = b with
      A = 2 Σ_m Σ_t (p_mt − p̄_m)(p_mt − p̄_m)ᵀ ... (standard derivation)
      b = Σ_m Σ_t (p_mt − p̄_m) (||p_mt||² − mean ||p_m||²)
    """
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for traj in marker_trajs:
        p = np.asarray(traj, dtype=np.float64)
        pbar = p.mean(axis=0)
        d = p - pbar
        sq = np.einsum("ti,ti->t", p, p)
        sqbar = sq.mean()
        A += 2.0 * (d.T @ d)
        b += np.einsum("ti,t->i", d, sq - sqbar)
    return np.linalg.solve(A + 1e-12 * np.eye(3), b)


def estimate_joint_centers_in_segment_frames(
    parent_markers: Dict[str, np.ndarray],
    child_markers: Dict[str, np.ndarray],
) -> np.ndarray:
    """Estimate the world-frame (quasi-stationary trials) center of the
    joint connecting two marker clusters: use markers from BOTH segments —
    each keeps constant distance to the true center."""
    trajs = list(parent_markers.values()) + list(child_markers.values())
    return estimate_joint_center(trajs)


def segment_lengths_from_centers(
    centers: Dict[str, np.ndarray], chain: Sequence[Tuple[str, str]]
) -> Dict[Tuple[str, str], float]:
    """Bone lengths from consecutive joint centers — the scale
    initialization IKInitializer feeds the MarkerFitter."""
    return {
        (a, b): float(np.linalg.norm(centers[a] - centers[b]))
        for a, b in chain
    }

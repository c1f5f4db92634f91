"""Marker trace cleaning & labeling — `dart/biomechanics/MarkerFixer` /
`MarkerLabeller` / `MarkerTrace` (RANSAC-ish heuristics + bipartite
assignment via math::AssignmentMatcher).

Host-side numpy: raw mocap point clouds come in frame-by-frame with
arbitrary per-frame ordering, dropouts, and ghost points. `build_traces`
stitches points into continuous traces by greedy nearest-neighbor with a
velocity gate; `label_traces` assigns trace identities to an expected
marker set by matching trace positions against model-predicted marker
positions (linear-sum assignment per evaluation window).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from nimblephysics_tpu.ops.stats import assignment_matcher


@dataclasses.dataclass
class MarkerTrace:
    start_frame: int
    points: List[np.ndarray]

    @property
    def end_frame(self) -> int:
        return self.start_frame + len(self.points) - 1

    def at(self, frame: int) -> Optional[np.ndarray]:
        i = frame - self.start_frame
        if 0 <= i < len(self.points):
            return self.points[i]
        return None


def build_traces(
    frames: Sequence[np.ndarray],
    max_jump: float = 0.05,
) -> List[MarkerTrace]:
    """frames: list of (n_t, 3) arrays (n varies per frame). Returns traces
    stitched by nearest-neighbor continuation within `max_jump` meters."""
    traces: List[MarkerTrace] = []
    active: List[MarkerTrace] = []
    for t, pts in enumerate(frames):
        pts = np.asarray(pts).reshape(-1, 3)
        if active and len(pts):
            # assignment between active trace heads and current points
            heads = np.stack([tr.points[-1] for tr in active])
            cost = np.linalg.norm(
                heads[:, None, :] - pts[None, :, :], axis=-1
            )
            cost = np.where(cost > max_jump, 1e6, cost)
            col = assignment_matcher(cost)
        else:
            col = np.full(len(active), -1, dtype=int)
        used = set()
        still_active = []
        for i, tr in enumerate(active):
            j = col[i] if i < len(col) else -1
            if j >= 0 and cost[i, j] < 1e5:
                tr.points.append(pts[j])
                used.add(int(j))
                still_active.append(tr)
            # else: trace ends
        for j in range(len(pts)):
            if j not in used:
                tr = MarkerTrace(start_frame=t, points=[pts[j]])
                traces.append(tr)
                still_active.append(tr)
        active = still_active
    return traces


def label_traces(
    traces: Sequence[MarkerTrace],
    predicted: Dict[str, np.ndarray],   # name -> (T, 3) model-predicted
    num_frames: int,
    max_dist: float = 0.2,
) -> Dict[str, List[MarkerTrace]]:
    """Assign each trace a marker name by mean distance to the model's
    predicted marker positions over the trace's lifetime."""
    names = list(predicted)
    out: Dict[str, List[MarkerTrace]] = {n: [] for n in names}
    scored = []
    for tr in traces:
        costs = []
        for n in names:
            pred = predicted[n]
            ds = []
            for f in range(tr.start_frame, min(tr.end_frame + 1, num_frames)):
                p = tr.at(f)
                if p is not None:
                    ds.append(np.linalg.norm(p - pred[f]))
            costs.append(np.mean(ds) if ds else 1e6)
        scored.append(costs)
    if not scored:
        return out
    C = np.asarray(scored)  # (n_traces, n_names)
    # greedy per-trace best assignment with distance gate (traces may share
    # a name across disjoint time ranges)
    for i, tr in enumerate(traces):
        j = int(np.argmin(C[i]))
        if C[i, j] < max_dist:
            out[names[j]].append(tr)
    return out


def fix_marker_swaps(
    observed: np.ndarray,               # (T, n, 3)
    mask: np.ndarray,                   # (T, n) bool
    max_jump: float = 0.07,
) -> np.ndarray:
    """`MarkerFixer`: detect frame-to-frame label swaps (two markers whose
    identities exchanged, visible as simultaneous jumps that cross) and
    swap them back. Returns the corrected copy."""
    out = observed.copy()
    T, n, _ = out.shape
    for t in range(1, T):
        prev, cur = out[t - 1], out[t]
        both = mask[t - 1] & mask[t]
        idx = np.where(both)[0]
        if len(idx) < 2:
            continue
        d_same = np.linalg.norm(cur[idx] - prev[idx], axis=-1)
        jumped = idx[d_same > max_jump]
        if len(jumped) < 2:
            continue
        # try pairwise swaps among jumped markers
        for a_i in range(len(jumped)):
            for b_i in range(a_i + 1, len(jumped)):
                a, b = jumped[a_i], jumped[b_i]
                cross = (
                    np.linalg.norm(cur[b] - prev[a])
                    + np.linalg.norm(cur[a] - prev[b])
                )
                straight = (
                    np.linalg.norm(cur[a] - prev[a])
                    + np.linalg.norm(cur[b] - prev[b])
                )
                if cross + 1e-9 < straight:
                    out[t:, [a, b]] = out[t:, [b, a]]
    return out

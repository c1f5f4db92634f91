"""GraphFlowDiscretizer — mocap energy-flow bookkeeping utility.

Role parity with `dart/math/GraphFlowDiscretizer.{hpp,cpp}`: given per-node
"energy levels" over time and per-arc flow rates on a fixed directed graph,
(1) project the arc rates so they exactly account for the observed level
changes (conservation clean-up), and (2) discretize the continuous flows
into a bounded set of particle paths that move between nodes over time
(used to turn continuous biomechanical energy flows into discrete,
visualizable packets).

Host-side NumPy: this is an offline analysis utility, not a hot path.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ParticlePath:
    start_time: int
    node_history: List[int]
    energy_value: float


class GraphFlowDiscretizer:
    def __init__(
        self,
        num_nodes: int,
        arcs: Sequence[Tuple[int, int]],
        node_attached_to_sink: Sequence[bool],
    ):
        self.num_nodes = num_nodes
        self.arcs = list(arcs)
        self.node_attached_to_sink = list(node_attached_to_sink)

    def clean_up_arc_rates(
        self, energy_levels: np.ndarray, arc_rates: np.ndarray
    ) -> np.ndarray:
        """Minimally adjust arc rates (least squares) so that, at every
        timestep, each node's level change equals its net arc inflow —
        with sink-attached nodes allowed free exchange with the sink.

        energy_levels: (num_nodes, T); arc_rates: (num_arcs, T-1) with
        arc k carrying flow from arcs[k][0] to arcs[k][1]."""
        levels = np.asarray(energy_levels, dtype=np.float64)
        rates = np.asarray(arc_rates, dtype=np.float64).copy()
        n, T = levels.shape
        m = len(self.arcs)
        # incidence: net inflow at node i = sum_k A[i,k] * rate[k]
        A = np.zeros((n, m))
        for k, (a, b) in enumerate(self.arcs):
            A[a, k] -= 1.0
            A[b, k] += 1.0
        free = np.asarray(self.node_attached_to_sink, dtype=bool)
        rows = ~free                      # conservation enforced here only
        A_c = A[rows]
        if A_c.size == 0 or rates.shape[1] == 0:
            return rates
        for t in range(min(T - 1, rates.shape[1])):
            d_level = levels[rows, t + 1] - levels[rows, t]
            resid = d_level - A_c @ rates[:, t]
            # minimum-norm correction: rates += A_cᵀ (A_c A_cᵀ)⁻¹ resid
            corr, *_ = np.linalg.lstsq(A_c, resid, rcond=None)
            rates[:, t] += corr
        return rates

    def discretize(
        self,
        max_simultaneous_particles: int,
        energy_levels: np.ndarray,
        arc_rates: np.ndarray,
    ) -> List[ParticlePath]:
        """Greedy particle realization of the flows: each particle carries
        an equal energy quantum; arcs transfer whole particles when enough
        flow has accumulated; sink-attached nodes create/destroy particles
        to match their level."""
        levels = np.asarray(energy_levels, dtype=np.float64)
        rates = np.asarray(arc_rates, dtype=np.float64)
        n, T = levels.shape
        total = max(levels.max(), 1e-12)
        quantum = total * n / max(max_simultaneous_particles, 1)

        paths: List[ParticlePath] = []
        live: List[ParticlePath] = []
        node_particles: List[List[ParticlePath]] = [[] for _ in range(n)]

        def spawn(node, t):
            p = ParticlePath(start_time=t, node_history=[node],
                             energy_value=quantum)
            paths.append(p)
            live.append(p)
            node_particles[node].append(p)
            return p

        def kill(p):
            live.remove(p)
            node_particles[p.node_history[-1]].remove(p)

        # initial population
        for i in range(n):
            for _ in range(max(0, int(round(levels[i, 0] / quantum)))):
                spawn(i, 0)

        accum = np.zeros(len(self.arcs))
        for t in range(min(T - 1, rates.shape[1] if rates.ndim > 1 else 0)):
            accum += rates[:, t]
            moved = set()
            for k, (a, b) in enumerate(self.arcs):
                while accum[k] >= quantum and node_particles[a]:
                    p = node_particles[a].pop()
                    p.node_history.append(b)
                    node_particles[b].append(p)
                    moved.add(id(p))
                    accum[k] -= quantum
                while accum[k] <= -quantum and node_particles[b]:
                    p = node_particles[b].pop()
                    p.node_history.append(a)
                    node_particles[a].append(p)
                    moved.add(id(p))
                    accum[k] += quantum
            # sink exchange: match particle count to level at sink nodes
            for i in range(n):
                if not self.node_attached_to_sink[i]:
                    continue
                want = max(0, int(round(levels[i, t + 1] / quantum)))
                while len(node_particles[i]) < want:
                    moved.add(id(spawn(i, t + 1)))
                while len(node_particles[i]) > want:
                    kill(node_particles[i][-1])
            # particles that did not move stay on their node
            for p in live:
                if id(p) not in moved and len(p.node_history) < (t + 2 - p.start_time):
                    p.node_history.append(p.node_history[-1])
        return paths

"""Motion retargeting between differently-parameterized skeletons —
`dart/biomechanics/SkeletonConverter` (521 LoC).

The reference links corresponding joints/markers between a source and a
target skeleton and retargets motion with iterative IK. Here:
link corresponding body POINTS, then solve per-frame damped-least-squares
IK on the target (warm-started along the trajectory) — one jitted scan
over the trial.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.neural.mappings import marker_positions


@dataclasses.dataclass(frozen=True)
class SkeletonConverter:
    """correspondences: pairs of (source (body, offset), target (body,
    offset)) points that should coincide."""

    source: Model
    target: Model
    source_points: Tuple[Tuple[int, tuple], ...]
    target_points: Tuple[Tuple[int, tuple], ...]

    def _src_markers(self):
        return [(b, jnp.asarray(o)) for b, o in self.source_points]

    def _tgt_markers(self):
        return [(b, jnp.asarray(o)) for b, o in self.target_points]

    def retarget(
        self,
        source_qs: jax.Array,          # (T, nq_src)
        q0_target: jax.Array,          # (nq_tgt,) initial guess
        iters_per_frame: int = 30,
        damping: float = 1e-5,
    ) -> jax.Array:
        """(T, nq_tgt) target poses tracking the source motion."""
        src_m = self._src_markers()
        tgt_m = self._tgt_markers()

        def targets_of(q_src):
            return marker_positions(self.source, q_src, src_m).reshape(-1)

        def tgt_fn(q_tgt):
            return marker_positions(self.target, q_tgt, tgt_m).reshape(-1)

        jac = jax.jacfwd(tgt_fn)
        n_tgt = q0_target.shape[0]

        def solve_frame(q_prev, q_src):
            target = targets_of(q_src)

            def body(q, _):
                err = tgt_fn(q) - target
                J = jac(q)
                JtJ = J.T @ J + damping * jnp.eye(n_tgt, dtype=q.dtype)
                dq = jnp.linalg.solve(JtJ, J.T @ err)
                return q - jnp.clip(dq, -0.3, 0.3), None

            q, _ = jax.lax.scan(body, q_prev, None, length=iters_per_frame)
            return q, q

        _, qs = jax.lax.scan(solve_frame, q0_target, source_qs)
        return qs

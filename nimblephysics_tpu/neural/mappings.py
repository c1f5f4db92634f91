"""World-space mappings & IK — `dart/neural/Mapping`/`IKMapping` +
`dart/math/IKSolver`.

An `IKMapping` maps generalized coordinates into a concatenation of
world-space body coordinates (`IKMapping.hpp:18-62`: spatial 6D / linear
3D / angular 3D per node + COM entries), so losses and optimizers can work
in task space. The reference hand-maintains real<->mapped Jacobians and an
iterative `setPositions`; here the forward map is a plain differentiable
function (Jacobians via AD) and the inverse is damped-least-squares IK.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import lie


@dataclasses.dataclass(frozen=True)
class IKMapping:
    """entries: tuple of (kind, body_index) with kind in
    {"spatial", "linear", "angular", "com"} (IKMapping.hpp node types)."""

    model: Model
    entries: Tuple[Tuple[str, int], ...]

    @property
    def out_dim(self) -> int:
        return sum(
            6 if k == "spatial" else 3 for k, _ in self.entries
        )

    def map_positions(self, q: jax.Array) -> jax.Array:
        """q -> mapped world-space position vector."""
        kin = dyn.forward_kinematics(self.model, q)
        parts: List[jax.Array] = []
        for kind, b in self.entries:
            if kind == "com":
                parts.append(dyn.com_position(self.model, kin))
                continue
            T = kin.T_wb[b]
            if kind == "linear":
                parts.append(T.p)
            elif kind == "angular":
                parts.append(lie.logm_so3(T.R))
            elif kind == "spatial":
                parts.append(jnp.concatenate([lie.logm_so3(T.R), T.p]))
            else:
                raise ValueError(kind)
        return jnp.concatenate(parts)

    def map_velocities(self, q: jax.Array, v: jax.Array) -> jax.Array:
        """Time derivative of the mapped positions along (q, v)."""
        _, out = jax.jvp(self.map_positions, (q,), (v,))
        return out

    def jacobian(self, q: jax.Array) -> jax.Array:
        """Real -> mapped Jacobian (getRealPosToMappedPosJac)."""
        return jax.jacfwd(self.map_positions)(q)

    def inverse_positions(
        self, target: jax.Array, q_init: jax.Array, iters: int = 50,
        damping: float = 1e-6,
    ) -> jax.Array:
        """Mapped -> real via damped least squares (`IKMapping::setPositions`
        iterative IK). Fixed iterations; jittable."""
        return ik_solve(self.map_positions, target, q_init, iters, damping)


def ik_solve(
    f, target: jax.Array, q_init: jax.Array, iters: int = 50,
    damping: float = 1e-6, step_clip: float = 0.5,
):
    """Damped-least-squares IK on an arbitrary differentiable task map
    (`math::IKSolver` equivalent): min ||f(q) − target||."""

    def body(q, _):
        err = f(q) - target
        J = jax.jacfwd(f)(q)
        JtJ = J.T @ J + damping * jnp.eye(q.shape[0], dtype=q.dtype)
        dq = jnp.linalg.solve(JtJ, J.T @ err)
        dq = jnp.clip(dq, -step_clip, step_clip)
        return q - dq, jnp.sum(err * err)

    q, hist = jax.lax.scan(body, q_init, None, length=iters)
    return q


def marker_positions(
    model: Model, q: jax.Array, markers: Sequence[Tuple[int, jax.Array]]
) -> jax.Array:
    """World positions of body-fixed markers (dart/dynamics/Marker): markers
    = [(body_index, local_offset)], returns (n_markers, 3). The base
    primitive of the biomechanics fitting pipelines."""
    kin = dyn.forward_kinematics(model, q)
    return jnp.stack([kin.T_wb[b].apply(off) for b, off in markers])

"""BatchGaitInverseDynamics — whole-trial inverse dynamics with contact.

Role parity with `dart/biomechanics/BatchGaitInverseDynamics.{hpp,cpp}`:
given a pose trial, per-frame ground-reaction data, and the contact
bodies, compute per-frame joint torques via RNEA with the measured
wrenches applied, plus the residual root forces (the physical-consistency
error) and per-frame contact phase flags. One vmapped, jittable sweep —
the reference's per-frame thread pool becomes the batch axis.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


class GaitInverseDynamicsResult(NamedTuple):
    taus: jax.Array            # (T-2, nq) joint torques
    root_residuals: jax.Array  # (T-2, n_root) leftover root forces
    contact_phase: jax.Array   # (T, n_feet) bool, from the wrench mask


def batch_gait_inverse_dynamics(
    model: Model,
    qs: jax.Array,                 # (T, nq)
    wrenches: jax.Array,           # (T, nb, 6) body-frame external wrenches
    contact_mask: jax.Array,       # (T, n_feet) bool
    root_dofs: Sequence[int] = (0, 1, 2, 3, 4, 5),
) -> GaitInverseDynamicsResult:
    """Central-difference kinematics + RNEA over every interior frame."""
    dtype = qs.dtype
    dt = jnp.asarray(model.dt, dtype=dtype)
    nb = model.num_bodies
    root_idx = jnp.asarray(tuple(root_dofs), dtype=jnp.int32)

    qm = qs[1:-1]
    vm = (qs[2:] - qs[:-2]) / (2 * dt)
    am = (qs[2:] - 2 * qs[1:-1] + qs[:-2]) / dt**2
    wm = wrenches[1:-1]

    def frame(q, v, a, w):
        tau = dyn.rnea(model, q, v, a, f_ext=[w[i] for i in range(nb)])
        return tau, tau[root_idx]

    taus, res = jax.vmap(frame)(qm, vm, am, wm)
    return GaitInverseDynamicsResult(
        taus=taus, root_residuals=res, contact_phase=contact_mask
    )

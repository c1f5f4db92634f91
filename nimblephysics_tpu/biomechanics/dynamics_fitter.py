"""Dynamics fitting — the `DynamicsFitter` core (DynamicsFitter.hpp:33-1633).

The reference fits mass/COM/inertia (+ fine-tunes motion) so inverse
dynamics matches force-plate data, organized around `ResidualForceHelper`:
the root-dof components of RNEA are the "residual forces" a physical
trajectory must not need. Here:

  * `root_residuals` — inverse dynamics residual at the (unactuated) root
    dofs given observed motion and measured external forces
  * `fit_inertia` — one jitted Adam solve over {log-masses, COM offsets}
    minimizing residuals over the trial (vmapped over frames), the role of
    `runIPOPTOptimization` + `zeroLinearResidualsAndOptimizeAngular`
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn


def root_residuals(
    model: Model,
    q: jax.Array,
    v: jax.Array,
    qdd: jax.Array,
    root_dofs: Sequence[int],
    f_ext: Optional[list] = None,
) -> jax.Array:
    """Inverse-dynamics force at the root dofs (`ResidualForceHelper::
    calculateResidual`): zero for physically consistent motion + forces."""
    tau = dyn.rnea(model, q, v, qdd, f_ext=f_ext)
    return tau[jnp.asarray(root_dofs, dtype=jnp.int32)]


class InertiaFitResult(NamedTuple):
    masses: jax.Array
    coms: jax.Array
    loss_history: jax.Array
    final_residual_rms: jax.Array


def fit_inertia(
    model: Model,
    qs: jax.Array,     # (T, nq) observed positions
    vs: jax.Array,     # (T, nq)
    qdds: jax.Array,   # (T, nq)
    root_dofs: Sequence[int],
    taus: Optional[jax.Array] = None,   # (T, nq) known applied forces
    iters: int = 400,
    lr: float = 2e-2,
    fit_coms: bool = True,
    regularize: float = 1e-3,
) -> InertiaFitResult:
    """Fit body masses (and COMs) so root residuals vanish across the trial."""
    dtype = model.mass.dtype
    root_idx = jnp.asarray(tuple(root_dofs), dtype=jnp.int32)

    params0 = dict(
        log_mass=jnp.log(model.mass),
        d_com=jnp.zeros_like(model.com),
    )

    def residual_frame(m2, q, v, qdd, tau_known):
        tau = dyn.rnea(m2, q, v, qdd)
        r = tau[root_idx]
        if tau_known is not None:
            r = r - tau_known[root_idx]
        return r

    def loss(params):
        m2 = model.replace(
            mass=jnp.exp(params["log_mass"]),
            com=model.com + (params["d_com"] if fit_coms else 0.0),
        )
        if taus is not None:
            res = jax.vmap(lambda q, v, a, t: residual_frame(m2, q, v, a, t))(
                qs, vs, qdds, taus
            )
        else:
            res = jax.vmap(lambda q, v, a: residual_frame(m2, q, v, a, None))(
                qs, vs, qdds
            )
        reg = regularize * (
            jnp.mean((params["log_mass"] - jnp.log(model.mass)) ** 2)
            + jnp.mean(params["d_com"] ** 2)
        )
        return jnp.mean(res * res) + reg

    opt = optax.adam(lr)

    def body(carry, _):
        p, s = carry
        val, g = jax.value_and_grad(loss)(p)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), val

    (params, _), hist = jax.lax.scan(
        body, (params0, opt.init(params0)), None, length=iters
    )
    masses = jnp.exp(params["log_mass"])
    coms = model.com + (params["d_com"] if fit_coms else 0.0)
    m2 = model.replace(mass=masses, com=coms)
    if taus is not None:
        res = jax.vmap(lambda q, v, a, t: residual_frame(m2, q, v, a, t))(
            qs, vs, qdds, taus
        )
    else:
        res = jax.vmap(lambda q, v, a: residual_frame(m2, q, v, a, None))(
            qs, vs, qdds
        )
    return InertiaFitResult(
        masses=masses,
        coms=coms,
        loss_history=hist,
        final_residual_rms=jnp.sqrt(jnp.mean(res * res)),
    )

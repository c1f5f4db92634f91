"""Step Jacobian oracles — `BackpropSnapshot` by another name.

The reference computes six analytic Jacobians of the timestep
(`BackpropSnapshot.cpp:161-190`): pos-pos, pos-vel, vel-pos, vel-vel,
force-vel, mass-vel, then chain-rules loss gradients through them
(`backprop`, :121) and exposes an RL-flavored (state, action) wrapper
(`backpropState`, BackpropSnapshot.hpp:53). Here each is a slice of one
jacfwd through the differentiable step — including THROUGH the contact
LCP via its active-set custom_vjp — so the analytic-vs-FD contract the
reference enforces with `mSlowDebugResultsAgainstFD` holds by
construction (see tests/test_neural.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.simulation.step import step


class StepJacobians(NamedTuple):
    """The six Jacobians of (q', v') wrt (q, v, tau, mass)."""

    pos_pos: jax.Array    # dq'/dq   (nq, nq)
    pos_vel: jax.Array    # dv'/dq
    vel_pos: jax.Array    # dq'/dv
    vel_vel: jax.Array    # dv'/dv
    force_vel: jax.Array  # dv'/dtau (nq, na)
    mass_vel: jax.Array   # dv'/dmass (nq, nb)


def step_jacobians(model: Model, state: State, action: jax.Array) -> StepJacobians:
    """All six step Jacobians at (state, action) in one forward-mode sweep."""

    def f(q, v, a, mass):
        m2 = model.replace(mass=mass)
        s2 = step(m2, State(q, v), a)
        return s2.q, s2.v

    (dqdq, dqdv, dqda, dqdm), (dvdq, dvdv, dvda, dvdm) = jax.jacfwd(
        f, argnums=(0, 1, 2, 3)
    )(state.q, state.v, action, model.mass)
    return StepJacobians(
        pos_pos=dqdq,
        pos_vel=dvdq,
        vel_pos=dqdv,
        vel_vel=dvdv,
        force_vel=dvda,
        mass_vel=dvdm,
    )


def backprop_state(
    model: Model, state: State, action: jax.Array, grad_next_state: jax.Array,
    explore_alternate_strategies: bool = False,
):
    """`BackpropSnapshot::backpropState`: pull a loss gradient wrt the NEXT
    flat state back to (grad wrt current flat state, grad wrt action).

    With `explore_alternate_strategies` (the reference's saddle-point-escape
    heuristic, BackpropSnapshot.hpp:49 / ConstrainedGroupGradientMatrices
    .cpp:1947-2037): in addition to the mathematically-correct gradient,
    compute a second gradient under an OVERRIDDEN active-set
    classification — frictional rows un-clamped, each normal/limit row
    clamped iff the loss wants its separating velocity DEcreased
    (lossWrtContactVels = Jᵀ... here J g_v' >= 0) — and return whichever
    direction has the larger magnitude ‖g_v‖ + ‖g_τ‖/dt. The result is
    "mathematically incorrect, but can provide a good search direction"
    (the reference's own words): at a blocked contact (e.g. a resting ball
    whose control gradient is annihilated by the clamping constraint) the
    unclamped direction lets an optimizer escape the saddle. Fully
    jittable (the strategy choice is a `jnp.where`)."""

    def f(x, a):
        s2 = step(model, State.from_flat(x), a)
        return s2.flat()

    _, vjp = jax.vjp(f, state.flat(), action)
    gx, ga = vjp(grad_next_state)
    if not explore_alternate_strategies:
        return gx, ga

    from nimblephysics_tpu.ops.contact import contact_step, lcp_dim, lcp_findex
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses,
        frozen_contact_step,
        gov_matrix,
    )
    import numpy as np

    m = lcp_dim(model)
    if m == 0:
        return gx, ga

    nq = model.nq
    g_v_next = grad_next_state[nq:]
    _, info = contact_step(
        model, state, model.action_to_tau(action), return_info=True
    )
    # loss wrt the constraint-space velocities: J g_v'
    loss_wrt_contact_vels = info.J @ g_v_next
    fi = np.asarray(lcp_findex(model))
    frictional = jnp.asarray(fi >= 0)
    # normal/limit rows: "if we want to increase contact vels (pulling
    # further apart), try not-clamping; else clamping"
    cmask = jnp.where(
        frictional, 0.0,
        jnp.where(loss_wrt_contact_vels < 0, 0.0, 1.0),
    ).astype(grad_next_state.dtype)
    classes = FrozenClasses(cmask=cmask, us=jnp.zeros_like(cmask))
    gov = jnp.asarray(gov_matrix(model), dtype=grad_next_state.dtype)

    def f_alt(x, a):
        s2 = frozen_contact_step(
            model, State.from_flat(x), model.action_to_tau(a), classes, gov
        )
        return s2.flat()

    _, vjp_alt = jax.vjp(f_alt, state.flat(), action)
    gx2, ga2 = vjp_alt(grad_next_state)

    def mag(gx_, ga_):
        return jnp.linalg.norm(gx_[nq:]) + jnp.linalg.norm(ga_) / model.dt

    better = mag(gx2, ga2) > mag(gx, ga)
    return (
        jnp.where(better, gx2, gx),
        jnp.where(better, ga2, ga),
    )

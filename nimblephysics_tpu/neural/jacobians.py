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
    model: Model, state: State, action: jax.Array, grad_next_state: jax.Array
):
    """`BackpropSnapshot::backpropState`: pull a loss gradient wrt the NEXT
    flat state back to (grad wrt current flat state, grad wrt action)."""

    def f(x, a):
        s2 = step(model, State.from_flat(x), a)
        return s2.flat()

    _, vjp = jax.vjp(f, state.flat(), action)
    gx, ga = vjp(grad_next_state)
    return gx, ga

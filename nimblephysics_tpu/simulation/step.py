"""The differentiable timestep — functional `World::step`.

Reference semantics (`dart/simulation/World.cpp:221-254`, Nimble's
"parallel velocity and position updates" `World.cpp:310-325`):

    1. q̈  = ABA(q_t, v_t, tau)          (unconstrained forward dynamics)
    2. v*  = v_t + dt·q̈                 (pre-constraint velocity)
    3. v_{t+1} = v* + M⁻¹ Jᵀ f          (constraint impulses — contact/limits)
    4. q_{t+1} = integrate(q_t, v_t)    (position update uses the PRE-step
                                         velocity, making step Jacobians
                                         block-triangular)

Step 3 is a no-op for contact-free worlds; with contacts it is the boxed-LCP
impulse solve with the analytic active-set VJP (`ops/contact.py`). The whole
step is a pure jittable function; batching over worlds is `vmap`, horizons
are `lax.scan`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import joints as J
from nimblephysics_tpu.ops.lie import Transform


def integrate_positions(model: Model, q: jax.Array, v: jax.Array) -> jax.Array:
    """Per-joint explicit position integration with pre-step velocities
    (`Skeleton::integratePositionsExplicit`)."""
    parts = []
    for i, jt in enumerate(model.joint_types):
        sl = model.joint_slice(i)
        if sl.stop == sl.start:
            continue
        T_cj = Transform(model.T_cj.R[i], model.T_cj.p[i])
        parts.append(
            J.integrate_position(jt, q[sl], v[sl], model.dt, model.axes[i], T_cj)
        )
    return jnp.concatenate(parts) if parts else q


def forward_step(
    model: Model, state: State, tau: jax.Array
) -> State:
    """One contact-free semi-implicit Euler step (constraints handled by the
    caller via `ops/contact.py` when the model has collision shapes)."""
    qdd = dyn.aba(model, state.q, state.v, tau)
    v_next = state.v + model.dt * qdd
    q_next = integrate_positions(model, state.q, state.v)
    return State(q=q_next, v=v_next)


def step(model: Model, state: State, action: jax.Array) -> State:
    """RL-style step: `action` drives the actuated dofs
    (`nimble.timestep(world, state, action)` equivalent, timestep.py:64-69).

    Dispatches to the contact step when the model has collision shapes.
    """
    tau = model.action_to_tau(action)
    from nimblephysics_tpu.ops.contact import contact_step, lcp_dim

    if lcp_dim(model) > 0:
        return contact_step(model, state, tau)
    return forward_step(model, state, tau)


def rollout(
    model: Model, state0: State, actions: jax.Array
) -> Tuple[State, State]:
    """Scan a horizon of controls: actions (T, num_actions).

    Returns (final_state, trajectory-of-States stacked on axis 0).

    For constrained models the previous step's LCP solution is carried in
    the scan as the next step's warm start — the reference's cached-LCP
    warm starting (`World::getCachedLCPSolution` →
    BoxedLcpConstraintSolver.cpp:422-458), which both speeds convergence
    and keeps active-set classes temporally stable.
    """
    from nimblephysics_tpu.ops.contact import contact_step, lcp_dim

    m = lcp_dim(model)
    if m == 0:
        def body(s, a):
            s2 = step(model, s, a)
            return s2, s2

        return jax.lax.scan(body, state0, actions)

    def body(carry, a):
        s, x_prev = carry
        s2, info = contact_step(
            model, s, model.action_to_tau(a), x_warm=x_prev, return_info=True
        )
        return (s2, info.impulses), s2

    x0 = jnp.zeros(m, dtype=state0.q.dtype) + 0.0 * state0.q[0]
    (final, _), traj = jax.lax.scan(body, (state0, x0), actions)
    return final, traj


@partial(jax.jit, static_argnums=0)
def rollout_jit(model: Model, state0: State, actions: jax.Array):
    return rollout(model, state0, actions)

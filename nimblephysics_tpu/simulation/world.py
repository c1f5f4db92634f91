"""Stateful `World` convenience wrapper + `timestep` — the end-user API.

The reference's user surface is a mutable `World` object plus
`nimble.timestep(world, state, action)` as a torch autograd function
(`python/nimblephysics/timestep.py:64-69`). In JAX the differentiable
primitive is simply the pure `timestep` below (AD "just works" through it,
including the LCP custom_vjp); `World` is a thin host-side holder for
people porting imperative reference code — it owns a Model, a current
State, time/frame counters, and a `Recording` (dart/simulation/Recording).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.simulation.step import step as _step_fn


def timestep(model: Model, state: State, action: jax.Array) -> State:
    """The differentiable step: `nimble.timestep(world, state, action)`
    equivalent. state/action may be batched (leading axes vmap away)."""
    if state.q.ndim == 1:
        return _step_fn(model, state, action)
    return jax.vmap(lambda s_q, s_v, a: _step_fn(model, State(s_q, s_v), a))(
        state.q, state.v, action
    )


class Recording:
    """Pose history (dart/simulation/Recording): host-side list of states."""

    def __init__(self):
        self._states: List[State] = []

    def add(self, state: State) -> None:
        self._states.append(state)

    def __len__(self) -> int:
        return len(self._states)

    def state(self, i: int) -> State:
        return self._states[i]

    def poses(self) -> np.ndarray:
        return np.stack([np.asarray(s.q) for s in self._states])

    def vels(self) -> np.ndarray:
        return np.stack([np.asarray(s.v) for s in self._states])

    def clear(self) -> None:
        self._states.clear()


class World:
    """Imperative facade over (Model, State). `World.hpp:483-520` RL API."""

    def __init__(self, model: Model, state: Optional[State] = None):
        self.model = model
        self.state = state or State(
            q=jnp.zeros(model.nq, model.mass.dtype),
            v=jnp.zeros(model.nq, model.mass.dtype),
        )
        self.time = 0.0
        self.frame = 0
        self.recording = Recording()
        self._jit_step = jax.jit(lambda s, a: _step_fn(model, s, a))

    # -- RL-style state/action API (World.hpp:483-520) ----------------------
    def get_state(self) -> np.ndarray:
        return np.asarray(self.state.flat())

    def set_state(self, x) -> None:
        self.state = State.from_flat(jnp.asarray(x, dtype=self.model.mass.dtype))

    def get_positions(self) -> np.ndarray:
        return np.asarray(self.state.q)

    def set_positions(self, q) -> None:
        self.state = State(jnp.asarray(q, dtype=self.model.mass.dtype), self.state.v)

    def get_velocities(self) -> np.ndarray:
        return np.asarray(self.state.v)

    def set_velocities(self, v) -> None:
        self.state = State(self.state.q, jnp.asarray(v, dtype=self.model.mass.dtype))

    @property
    def action_size(self) -> int:
        return self.model.num_actions

    # -- stepping -----------------------------------------------------------
    def step(self, action=None, record: bool = True) -> State:
        a = (
            jnp.zeros(self.model.num_actions, self.model.mass.dtype)
            if action is None
            else jnp.asarray(action, dtype=self.model.mass.dtype)
        )
        self.state = self._jit_step(self.state, a)
        self.time += float(self.model.dt)
        self.frame += 1
        if record:
            self.recording.add(self.state)
        return self.state

    def reset(self, state: Optional[State] = None) -> None:
        if state is not None:
            self.state = state
        self.time = 0.0
        self.frame = 0
        self.recording.clear()

    # -- gradients (BackpropSnapshot::backpropState equivalent) --------------
    def state_jacobian(self, action) -> np.ndarray:
        """d(next flat state)/d(flat state) at the current state —
        `World::getStateJacobian` (World.hpp:520)."""
        a = jnp.asarray(action, dtype=self.model.mass.dtype)

        def f(x):
            s = _step_fn(self.model, State.from_flat(x), a)
            return s.flat()

        return np.asarray(jax.jacrev(f)(self.state.flat()))

    def action_jacobian(self, action) -> np.ndarray:
        a = jnp.asarray(action, dtype=self.model.mass.dtype)

        def f(act):
            s = _step_fn(self.model, self.state, act)
            return s.flat()

        return np.asarray(jax.jacrev(f)(a))

"""Receding-horizon MPC — the `MPCLocal` equivalent.

Reference behavior (`dart/realtime/MPCLocal.cpp:180-300`): a background
thread loops {estimate state at a rounded future time, advance the plan,
re-optimize warm, publish the new force plan}, while the control thread
reads `getControlForceNow`. On TPU the replan is ONE jitted iLQR call
(fixed shapes, so horizon shifts never recompile), dispatched
asynchronously — the host loop overlaps the device solve with serving, the
double-buffer is an atomic plan swap, and warm starting is the shifted
previous solution (`Problem::advanceSteps` + `Solution::reoptimize`).

The same jitted replan vmaps over thousands of scenario worlds — that is
the BASELINE "batched MPC solves/s" metric.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.realtime.buffer import ControlPlan, VectorLog, control_at, estimate_state_at
from nimblephysics_tpu.trajectory.ilqr import ILQRConfig, ilqr_solve


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 100
    replan_iters: int = 8           # iLQR iterations per replan (warm-started)
    first_solve_iters: int = 40     # cold-start iterations for the first plan
    use_feedback_gains: bool = True
    # scan unroll for the solver time loops; keep low for contact models
    # (their per-step graphs are large and compile time scales with unroll)
    unroll: int = 10


class MPC:
    """Host-side receding-horizon controller around a jitted iLQR replan."""

    def __init__(
        self,
        model: Model,
        running_cost: Callable,
        final_cost: Callable,
        config: MPCConfig = MPCConfig(),
        planning_model: Optional[Model] = None,
    ):
        """`model` is the plant (used for state estimation / buffers);
        `planning_model` is what iLQR linearizes — pass
        `relax_limits(model)` to plan with smooth dynamics while the world
        keeps the LCP constraint engine (the planner/plant split; big
        throughput win for limit-bearing models)."""
        self.model = model
        plan_model = planning_model if planning_model is not None else model
        self.config = config
        self.obs_log = VectorLog(2 * model.nq)
        self._plan: Optional[ControlPlan] = None
        self._dt = float(model.dt)
        na = model.num_actions
        H = config.horizon

        def replan(x0_flat, u_warm, iters):
            sol = ilqr_solve(
                plan_model,
                State.from_flat(x0_flat),
                u_warm,
                running_cost,
                final_cost,
                ILQRConfig(iters=iters, unroll=config.unroll),
            )
            return sol.u, sol.x, sol.K, sol.cost

        self._replan_warm = jax.jit(
            lambda x, u: replan(x, u, config.replan_iters)
        )
        self._replan_cold = jax.jit(
            lambda x, u: replan(x, u, config.first_solve_iters)
        )
        self._zero_u = jnp.zeros((H, na))

    # -- observation side (MPC::recordGroundTruthState, MPC.hpp:32) ---------
    def record_state(self, t: float, state: State) -> None:
        self.obs_log.record(t, np.asarray(state.flat()))

    # -- control side (MPC::getControlForceNow, MPC.hpp:23) -----------------
    def control_now(self, t: float, state: Optional[State] = None):
        if self._plan is None:
            return jnp.zeros(self.model.num_actions)
        x = state.flat() if state is not None else None
        return control_at(self._plan, t, x)

    # -- planner side -------------------------------------------------------
    def replan_at(self, now: float) -> float:
        """One optimizer-loop iteration (`MPCLocal::optimizePlan`). Returns
        the wall-clock duration of the solve."""
        obs = self.obs_log.latest_before(now)
        if obs is None:
            return 0.0
        t_obs, x_obs = obs
        state = State.from_flat(jnp.asarray(x_obs))

        t0 = time.time()
        if self._plan is None:
            x0 = state
            start_time = now
            u_warm = self._zero_u
            u, xs, K, cost = self._replan_cold(x0.flat(), u_warm)
        else:
            # round the plan start to the step grid ahead of `now`
            shift = max(
                1, int(np.ceil((now - self._plan.start_time) / self._dt))
            )
            start_time = self._plan.start_time + shift * self._dt
            x0 = estimate_state_at(self.model, self._plan, state, t_obs, start_time)
            # advanceSteps: shift previous controls left, hold the tail
            u_prev = self._plan.u
            shift_c = min(shift, u_prev.shape[0] - 1)
            u_warm = jnp.concatenate(
                [u_prev[shift_c:], jnp.tile(u_prev[-1:], (shift_c, 1))]
            )
            u, xs, K, cost = self._replan_warm(x0.flat(), u_warm)

        u = jax.block_until_ready(u)
        dur = time.time() - t0
        self._plan = ControlPlan(
            start_time=start_time,
            dt=self._dt,
            u=u,
            x_ref=xs if self.config.use_feedback_gains else None,
            K=K if self.config.use_feedback_gains else None,
        )
        return dur

    @property
    def plan(self) -> Optional[ControlPlan]:
        return self._plan


class Ticker:
    """Fixed-rate callback driver (`dart/realtime/Ticker`), synchronous
    variant for tests: `run(n)` invokes the callback n times at the given
    period against a simulated or real clock."""

    def __init__(self, period: float, realtime: bool = False):
        self.period = period
        self.realtime = realtime
        self._callbacks = []

    def register(self, fn: Callable[[float], None]) -> None:
        self._callbacks.append(fn)

    def run(self, steps: int, t0: float = 0.0) -> float:
        t = t0
        for _ in range(steps):
            for fn in self._callbacks:
                fn(t)
            if self.realtime:
                time.sleep(self.period)
            t += self.period
        return t

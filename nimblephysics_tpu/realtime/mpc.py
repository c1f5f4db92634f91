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


class AsyncMPC:
    """Background-replanning MPC — the actual `MPCLocal` concurrency model.

    The reference runs a dedicated optimization thread
    (`MPCLocal::start` -> `optimizationThreadLoop`,
    dart/realtime/MPCLocal.cpp:364-418) that re-optimizes continuously while
    the robot's control thread reads `getControlForceNow` from a
    double-buffered force plan (RealTimeControlBuffer.hpp:20-84). Here the
    replanner thread drives `MPC.replan_at` (the device solve releases the
    GIL while XLA executes, so serving overlaps the solve) and publishes
    each new plan twice:

      * into the native seqlock `RtControlBuffer` — the lock-free kHz path
        (`control_now_native`, no GIL-contended Python objects on read), and
      * as an atomic Python `ControlPlan` swap for the gain-feedback path.

    `control_now` never blocks on a replan in flight.
    """

    def __init__(self, mpc: MPC, clock: Optional[Callable[[], float]] = None,
                 min_period: float = 0.0):
        import threading

        self.mpc = mpc
        self._clock = clock if clock is not None else time.monotonic
        self._min_period = min_period
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._replan_durations: list = []
        try:
            from nimblephysics_tpu.native import RtControlBuffer

            self._buf = RtControlBuffer(mpc.config.horizon, mpc.model.num_actions)
        except Exception:  # native lib unavailable: Python-swap only
            self._buf = None

    # -- observation / control side (robot threads) -------------------------
    def record_state(self, t: float, state: State) -> None:
        self.mpc.record_state(t, state)

    def control_now(self, t: float, state: Optional[State] = None):
        """Gain-feedback serving path: reads the atomically-swapped Python
        plan. Never blocks on the replanner (plan swap is a single reference
        assignment under the GIL)."""
        return self.mpc.control_now(t, state)

    def control_now_native(self, t: float) -> Optional[np.ndarray]:
        """Lock-free open-loop serving path via the native seqlock buffer
        (RealTimeControlBuffer::getPlannedForce). Safe from any thread."""
        if self._buf is None:
            u = self.control_now(t)
            return np.asarray(u)
        _, u = self._buf.control_at(t)
        return u

    # -- planner thread ------------------------------------------------------
    def _loop(self) -> None:
        while not self._stop.is_set():
            t = self._clock()
            dur = self.mpc.replan_at(t)
            plan = self.mpc.plan
            if plan is not None and self._buf is not None:
                self._buf.publish(plan.start_time, plan.dt, np.asarray(plan.u))
            if dur > 0:
                self._replan_durations.append(dur)
            # MPCLocal sleeps only if the solve beat the plan horizon; we
            # optionally rate-limit to min_period for tests/CPU. Always
            # yield at least briefly — replan_at returns 0.0 before the
            # first observation arrives, and a no-op wait would busy-spin
            # this thread at 100% CPU.
            wait = self._min_period - dur
            if dur <= 0.0:
                wait = max(wait, 1e-3)
            if wait > 0:
                self._stop.wait(wait)

    def start(self) -> None:
        import threading

        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
            self._thread = None

    @property
    def num_published(self) -> int:
        if self._buf is not None:
            return self._buf.num_published
        return len(self._replan_durations)

    @property
    def replan_durations(self):
        return list(self._replan_durations)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False


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

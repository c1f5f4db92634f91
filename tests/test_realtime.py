"""Realtime MPC loop against a simulated clock + online sysid.

Mirrors `unittests/comprehensive/test_Realtime.cpp` (threaded MPC vs a
simulated world) and the SSID mass-regression loop (SSID.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.realtime import MPC, MPCConfig, SSID, SSIDConfig
from nimblephysics_tpu.realtime.buffer import ControlPlan, control_at
from nimblephysics_tpu.simulation.step import rollout, step


def test_control_plan_indexing():
    plan = ControlPlan(
        start_time=1.0, dt=0.1,
        u=jnp.asarray([[1.0], [2.0], [3.0]]),
    )
    assert float(control_at(plan, 0.5)[0]) == 1.0   # before start: clamp
    assert float(control_at(plan, 1.05)[0]) == 1.0
    assert float(control_at(plan, 1.15)[0]) == 2.0
    assert float(control_at(plan, 9.0)[0]) == 3.0   # past end: clamp


def test_mpc_balances_cartpole_in_closed_loop():
    """Simulated-clock closed loop: world steps at dt, MPC replans every 5
    steps from logged observations; the pole must stay upright."""
    model = builders.cartpole(dt=0.02)

    def running(x, u, t):
        return 1.0 * x[1] ** 2 + 0.2 * x[0] ** 2 + 1e-4 * jnp.sum(u**2)

    def final(x):
        return 50.0 * x[1] ** 2 + 10.0 * x[0] ** 2 + 1.0 * jnp.sum(x[2:] ** 2)

    mpc = MPC(model, running, final, MPCConfig(horizon=40, replan_iters=6,
                                               first_solve_iters=30))
    dt = 0.02
    state = State(q=jnp.asarray([0.0, 0.15]), v=jnp.zeros(2))
    t = 0.0
    mpc.record_state(t, state)
    mpc.replan_at(t)

    poles = []
    for i in range(120):
        u = mpc.control_now(t, state)
        state = step(model, state, u)
        t += dt
        mpc.record_state(t, state)
        if i % 5 == 0:
            mpc.replan_at(t)
        poles.append(float(state.q[1]))

    poles = np.asarray(poles)
    assert np.abs(poles[-20:]).max() < 0.12, poles[-20:]
    assert np.abs(poles).max() < 0.6  # never falls


def test_ssid_recovers_mass():
    """SSID must recover a perturbed link mass from trajectory data."""
    true_model = builders.pendulum(2, dt=0.01)
    rng = np.random.default_rng(0)
    q0 = jnp.asarray([0.4, -0.2])
    v0 = jnp.zeros(2)
    us = jnp.asarray(rng.standard_normal((80, 2)) * 2.0)
    _, traj = rollout(true_model, State(q0, v0), us)

    wrong = true_model.replace(mass=true_model.mass * jnp.asarray([1.6, 0.7]))
    ssid = SSID(wrong, SSIDConfig(iters=300, lr=0.05))
    masses, hist = ssid.identify_masses(q0, v0, us, traj.q, traj.v)
    np.testing.assert_allclose(
        np.asarray(masses), np.asarray(true_model.mass), rtol=0.05
    )
    assert float(hist[-1]) < 1e-6


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape[0] == args[0].shape[0]
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    ge.dryrun_multichip(8)


def test_async_mpc_background_replan_serves_concurrently():
    """AsyncMPC: a background thread replans + publishes via the native
    seqlock buffer while the control thread serves. Mirrors
    MPCLocal::start/optimizationThreadLoop (dart/realtime/MPCLocal.cpp:364).

    Asserts (a) plans are published without any replan_at call from the
    control thread, (b) the closed loop still balances, and (c) serving
    latency mid-replan stays microseconds-scale (never blocks on a solve)."""
    import time as _time

    from nimblephysics_tpu.realtime.mpc import AsyncMPC

    model = builders.cartpole(dt=0.02)

    def running(x, u, t):
        return 1.0 * x[1] ** 2 + 0.2 * x[0] ** 2 + 1e-4 * jnp.sum(u**2)

    def final(x):
        return 50.0 * x[1] ** 2 + 10.0 * x[0] ** 2 + 1.0 * jnp.sum(x[2:] ** 2)

    mpc = MPC(model, running, final, MPCConfig(horizon=40, replan_iters=6,
                                               first_solve_iters=30))
    dt = 0.02
    state = State(q=jnp.asarray([0.0, 0.15]), v=jnp.zeros(2))

    # simulated clock shared between the sim loop and the replanner thread
    clock_t = [0.0]
    amp = AsyncMPC(mpc, clock=lambda: clock_t[0], min_period=0.0)
    amp.record_state(0.0, state)
    amp.start()
    try:
        # wait for the first (cold) plan to be published by the background
        # thread — the control thread never calls replan_at
        deadline = _time.time() + 120.0
        while mpc.plan is None and _time.time() < deadline:
            _time.sleep(0.01)
        assert mpc.plan is not None, "background replanner never published"

        serve_lat = []
        poles = []
        for i in range(120):
            t0 = _time.perf_counter()
            u = amp.control_now(clock_t[0], state)
            serve_lat.append(_time.perf_counter() - t0)
            state = step(model, state, u)
            clock_t[0] += dt
            amp.record_state(clock_t[0], state)
            poles.append(float(state.q[1]))
        n_pub = amp.num_published
        assert n_pub >= 2, "replanner thread should publish continuously"
    finally:
        amp.stop()

    poles = np.asarray(poles)
    assert np.abs(poles).max() < 0.6, poles
    # serving must not block on in-flight solves: median latency far below
    # a replan duration (warm replans are >=1ms of device work)
    med = float(np.median(serve_lat))
    assert med < 0.02, f"serving blocked on replans: median {med*1e3:.1f} ms"
    # native seqlock path serves the same open-loop control
    u_native = amp.control_now_native(clock_t[0])
    assert u_native is not None and u_native.shape == (model.num_actions,)
    assert np.isfinite(u_native).all()

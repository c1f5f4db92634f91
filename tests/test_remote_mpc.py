"""Remote MPC over in-process gRPC loopback (the reference exercises
MPCRemote the same way — no fixture cluster)."""

import time

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.realtime import MPC, MPCConfig
from nimblephysics_tpu.realtime.remote import RemoteMPCClient, RemoteMPCServer
from nimblephysics_tpu.simulation.step import step


def test_remote_mpc_loopback_balances_cartpole():
    model = builders.cartpole(dt=0.02)

    def running(x, u, t):
        return 1.0 * x[1] ** 2 + 0.2 * x[0] ** 2 + 1e-4 * jnp.sum(u**2)

    def final(x):
        return 50.0 * x[1] ** 2 + 10.0 * x[0] ** 2 + jnp.sum(x[2:] ** 2)

    mpc = MPC(model, running, final, MPCConfig(horizon=40, replan_iters=6,
                                               first_solve_iters=30))
    server = RemoteMPCServer(mpc, port=0)
    server.start()
    try:
        client = RemoteMPCClient(f"127.0.0.1:{server.port}")

        state = State(q=jnp.asarray([0.0, 0.15]), v=jnp.zeros(2))
        t = 0.0
        client.record_state(t, np.asarray(state.flat()))
        mpc.replan_at(t)           # planner side (would be a server thread)
        assert client.sync_plan()

        poles = []
        for i in range(80):
            u = client.control_now(t, np.asarray(state.flat()))
            state = step(model, state, jnp.asarray(u))
            t += 0.02
            client.record_state(t, np.asarray(state.flat()))
            if i % 5 == 0:
                mpc.replan_at(t)
                client.sync_plan()
            poles.append(float(state.q[1]))

        poles = np.asarray(poles)
        assert np.abs(poles[-10:]).max() < 0.15, poles[-10:]
    finally:
        server.stop()


def test_plan_roundtrip_preserves_gains():
    from nimblephysics_tpu.realtime.buffer import ControlPlan
    from nimblephysics_tpu.realtime.remote import _msg_to_plan, _plan_to_msg

    rng = np.random.default_rng(0)
    plan = ControlPlan(
        start_time=1.5, dt=0.02,
        u=jnp.asarray(rng.standard_normal((10, 2))),
        x_ref=jnp.asarray(rng.standard_normal((11, 4))),
        K=jnp.asarray(rng.standard_normal((10, 2, 4))),
    )
    plan2 = _msg_to_plan(_plan_to_msg(plan))
    np.testing.assert_allclose(np.asarray(plan2.u), np.asarray(plan.u))
    np.testing.assert_allclose(np.asarray(plan2.K), np.asarray(plan.K))
    np.testing.assert_allclose(np.asarray(plan2.x_ref), np.asarray(plan.x_ref))
    assert plan2.start_time == 1.5 and plan2.dt == 0.02

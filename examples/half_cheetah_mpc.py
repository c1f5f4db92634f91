"""Half-cheetah receding-horizon MPC at H=100 (BASELINE config 4).

Loads the REAL reference scene (data/skel/half_cheetah.skel), runs the MPC
layer in a simulated-clock closed loop, and reports forward progress +
replan latency — the python analog of
unittests/comprehensive/test_HalfCheetahRealtime.cpp.
"""

import time

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.realtime import MPC, MPCConfig
from nimblephysics_tpu.simulation.step import step
from nimblephysics_tpu.utils.skel_parser import parse_skel


def main():
    model, s0 = parse_skel("/root/reference/data/skel/half_cheetah.skel")
    dt = float(model.dt)

    def running(x, u, t):
        vx = x[model.nq]  # forward velocity of the root
        return -1.0 * vx + 1e-4 * jnp.sum(u**2) + 0.5 * x[2] ** 2

    def final(x):
        return -5.0 * x[model.nq]

    mpc = MPC(model, running, final,
              MPCConfig(horizon=50, replan_iters=4, first_solve_iters=20, unroll=1))

    state = s0
    t = 0.0
    mpc.record_state(t, state)
    print("first solve:", f"{mpc.replan_at(t):.2f}s (includes compile)")

    replan_times = []
    xs = []
    for i in range(400):
        u = mpc.control_now(t, state)
        state = step(model, state, u)
        t += dt
        mpc.record_state(t, state)
        if i % 10 == 0:
            replan_times.append(mpc.replan_at(t))
        xs.append(float(state.q[0]))

    print(f"forward progress over {t:.2f}s: {xs[-1]:+.3f} m")
    print(f"mean warm replan: {np.mean(replan_times[1:])*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Headline benchmark: batched MPC solves/s at H=100 on one TPU chip.

BASELINE target (driver-set): >= 1000 batched MPC solves/s per chip at
horizon 100 (v5e-8). One "solve" = a full warm-started iLQR replan
(8 iterations: linearize dynamics along the horizon, Riccati backward,
line-searched forward) of a cartpole scenario, which is what the
receding-horizon MPC layer executes per replan per world.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> None:
    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.models.model import State, relax_limits
    from nimblephysics_tpu.trajectory.ilqr import (
        ILQRConfig,
        ilqr_solve,
        ilqr_solve_batch,
    )

    # Planning model: limits relaxed (the planner/plant split — the world
    # keeps the LCP constraint engine; the planner linearizes smooth
    # dynamics, which is how the realtime MPC layer is meant to be used).
    model = relax_limits(builders.cartpole(dt=0.02))
    nq, na = model.nq, model.num_actions
    H = 100
    B = int(os.environ.get("BENCH_BATCH", "4096"))
    ITERS = int(os.environ.get("BENCH_ITERS", "8"))
    N_ALPHA = int(os.environ.get("BENCH_ALPHAS", "6"))
    ALPHAS = (1.0, 0.6, 0.3, 0.1, 0.03, 0.01)[:N_ALPHA]
    RICCATI = os.environ.get("BENCH_RICCATI", "pallas")

    def running(x, u, t):
        return 0.1 * jnp.sum(x[:nq] ** 2) + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 10.0 * jnp.sum(x**2)

    cfg = ILQRConfig(iters=ITERS, alphas=ALPHAS, riccati=RICCATI)
    if RICCATI == "pallas":
        # Natively batched solver: one lane-parallel Pallas kernel for the
        # Riccati backward pass across the whole batch (the measured
        # bottleneck of the scan-based path).
        def solve_all(x0s, u_warms):
            sol = ilqr_solve_batch(model, x0s, u_warms, running, final, cfg)
            return sol.u, sol.cost

        solve_batch = jax.jit(solve_all)
    else:
        def solve_one(x0_flat, u_warm):
            sol = ilqr_solve(
                model, State.from_flat(x0_flat), u_warm, running, final, cfg
            )
            return sol.u, sol.cost

        solve_batch = jax.jit(jax.vmap(solve_one))

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (B, 2 * nq), minval=-0.3, maxval=0.3)
    u_warm = jnp.zeros((B, H, na))

    # compile + warm
    us, costs = solve_batch(x0, u_warm)
    float(jnp.sum(costs))  # device->host sync (block_until_ready alone has
    #                        been observed not to block on the remote path)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        us, costs = solve_batch(x0, us)  # warm-started like steady-state MPC
        float(jnp.sum(costs))
    dt = (time.time() - t0) / reps

    solves_per_s = B / dt
    target = 1000.0
    print(
        json.dumps(
            {
                "metric": "batched_mpc_solves_per_s_h100",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Batched domain-randomized MPC (BASELINE config 5 shape).

4096 cartpole scenarios with randomized initial states solved per replan
call, sharded over whatever devices exist (1 TPU chip here; the same code
spans pod slices via the same mesh)."""

import time

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.parallel.sharding import make_mesh, sharded_mpc_solves


def main():
    model = builders.cartpole(dt=0.02)
    nq, na = model.nq, model.num_actions
    H, B = 100, 4096

    def running(x, u, t):
        return 0.1 * jnp.sum(x[:nq] ** 2) + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 10.0 * jnp.sum(x**2)

    mesh = make_mesh((("dp", -1),))
    solve = sharded_mpc_solves(model, mesh, running, final, horizon=H, iters=8)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (B, 2 * nq), minval=-0.3, maxval=0.3)
    u = jnp.zeros((B, H, na))

    u, cost = solve(x0, u)          # compile + first solve
    jax.block_until_ready(u)
    t0 = time.time()
    u, cost = solve(x0, u)
    jax.block_until_ready(u)
    dt = time.time() - t0
    print(f"{B} scenario replans in {dt*1e3:.0f} ms "
          f"({B/dt:.0f} solves/s), mean cost {float(cost):.3f}")


if __name__ == "__main__":
    main()

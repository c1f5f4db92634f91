"""Catapult throw — frictional-contact trajectory optimization through
impact (BASELINE config 3; python/nimblephysics_examples/catapult.py).

The projectile rests against the catapult tail (box-box contact); tail
torques must fling it toward a target. Gradients flow through the contact
LCP's implicit active-set rule.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.simulation.step import rollout
from nimblephysics_tpu.trajectory import SingleShootingProblem, solve_single_shooting

TARGET = jnp.asarray([2.2, 2.2])


def main():
    model = builders.catapult(dt=0.002)
    # tails at 45/0/45 deg put the arm tip at ~(-0.10, -0.10); drop the
    # projectile just above it so it lands ON the arm before the throw
    q0 = jnp.zeros(model.nq).at[0].set(-0.104).at[1].set(-0.02)
    q0 = q0.at[2].set(np.pi / 4).at[3].set(0.0).at[4].set(np.pi / 4)
    s0 = State(q=q0, v=jnp.zeros(model.nq))
    T = 250

    def loss(traj):
        # projectile (dofs 0, 1) should reach the target; penalize controls
        p_end = traj.q[-1, :2]
        closest = jnp.min(
            jnp.sum((traj.q[:, :2] - TARGET[None, :]) ** 2, axis=1)
        )
        return (
            jnp.sum((p_end - TARGET) ** 2)
            + 0.5 * closest
            + 1e-6 * jnp.sum(traj.u**2)
        )

    prob = SingleShootingProblem(model=model, x0=s0, horizon=T, loss=loss)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((T, model.num_actions)) * 50.0)
    print(f"initial loss: {float(prob.objective(u0)):8.3f}")
    sol = jax.jit(lambda: solve_single_shooting(prob, u_init=u0, iters=120, lr=0.5))()
    print(f"optimized:    {float(sol.loss):8.3f}")
    _, traj = rollout(model, s0, sol.u)
    p = np.asarray(traj.q[:, :2])
    print(f"projectile start {p[0]}, end {p[-1]}, target {np.asarray(TARGET)}")
    print(f"max height reached: {p[:, 1].max():.3f} m")


if __name__ == "__main__":
    main()

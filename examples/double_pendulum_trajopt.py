"""Double-pendulum stabilization via multiple shooting (BASELINE config 1).

Mirrors the reference's trajectory examples
(python/nimblephysics_examples/*.py) on data/skel/inverted_double_pendulum.
Run with a clean CPU env or on TPU (see .claude/skills/verify/SKILL.md).
"""

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.trajectory import (
    MultipleShootingProblem,
    SingleShootingProblem,
    solve_multiple_shooting,
)


def main():
    model = builders.inverted_double_pendulum(dt=0.01)
    x0 = State(q=jnp.asarray([0.0, 0.35, -0.2]), v=jnp.zeros(3))

    def loss(traj):
        return (
            10.0 * jnp.sum(traj.q[-1] ** 2)
            + jnp.sum(traj.v[-1] ** 2)
            + 1e-3 * jnp.sum(traj.u**2)
        )

    prob = MultipleShootingProblem(
        model=model, x0=x0, num_segments=4, seg_len=20, loss=loss
    )
    sol = jax.jit(lambda: solve_multiple_shooting(prob))()
    ss = SingleShootingProblem(model=model, x0=x0, horizon=80, loss=loss)
    print(f"passive loss:  {float(ss.objective(jnp.zeros((80, 1)))):8.3f}")
    print(f"optimized:     {float(sol.loss):8.3f}")
    print(f"defect norm:   {float(sol.defect_norm):8.2e}")
    print(f"re-simulated:  {float(ss.objective(sol.u)):8.3f}")


if __name__ == "__main__":
    main()

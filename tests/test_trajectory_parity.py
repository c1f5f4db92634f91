"""Trajectory-problem parity features vs the reference:

  * static (sysid) decision variables — `Problem::flatten`'s flatStatic
    segment is the world masses (Problem.cpp:160-184)
  * tuneStartingState — SingleShot.cpp:29-32
  * LossFn as bounded constraint — LossFn.hpp:46-70
"""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.simulation.step import rollout
from nimblephysics_tpu.trajectory.shooting import (
    SingleShootingProblem,
    solve_single_shooting,
)
from nimblephysics_tpu.utils.fd import fd_grad


def _observed_pendulum_traj(mass_scale=2.0, x0=None):
    """Passive 2-link pendulum rollout with known true masses. Viscous
    damping makes the absolute mass scale observable (a frictionless
    passive pendulum is invariant to uniform mass scaling)."""
    model = builders.pendulum(n_links=2, dt=0.01, damping=0.8).replace(actuated=())
    true = model.replace(mass=model.mass * mass_scale)
    x0 = x0 if x0 is not None else State(q=jnp.asarray([0.4, -0.2]), v=jnp.zeros(2))
    _, traj = rollout(true, x0, jnp.zeros((60, 0)))
    return model, true, x0, traj


def test_static_mass_decision_variables_recover_sysid():
    """Mass as a static decision variable: fitting a passive observed
    trajectory recovers the true masses (sysid inside the trajopt flatten,
    Problem.cpp:176)."""
    model, true, x0, obs = _observed_pendulum_traj(mass_scale=2.0)

    def match_loss(traj):
        return jnp.mean((traj.q - obs.q) ** 2) + jnp.mean((traj.v - obs.v) ** 2)

    prob = SingleShootingProblem(
        model=model, x0=x0, horizon=60, loss=match_loss,
        static_vars=("mass",),
    )
    sol = jax.jit(
        lambda u: solve_single_shooting(prob, u_init=u, iters=400, lr=5e-2)
    )(jnp.zeros((60, 0)))
    m_fit = np.asarray(sol.params["mass"])
    m_true = np.asarray(true.mass)
    assert float(sol.loss) < 1e-8, float(sol.loss)
    assert np.allclose(m_fit, m_true, rtol=0.05), (m_fit, m_true)


def test_static_var_gradient_fd_twin():
    """d(loss)/d(mass) through rollout_params matches finite differences."""
    model, _, x0, obs = _observed_pendulum_traj(mass_scale=1.5)

    def match_loss(traj):
        return jnp.mean((traj.q - obs.q) ** 2)

    prob = SingleShootingProblem(
        model=model, x0=x0, horizon=60, loss=match_loss,
        static_vars=("mass",),
    )

    def f(mass):
        p = {"u": jnp.zeros((60, 0)), "mass": jnp.asarray(mass)}
        return prob.loss(prob.rollout_params(p))

    m0 = np.asarray(model.mass)
    g_ad = np.asarray(jax.grad(f)(jnp.asarray(m0)))
    g_fd = fd_grad(lambda m: float(f(m)), m0, eps=1e-6)
    assert np.allclose(g_ad, g_fd, rtol=1e-5, atol=1e-9), (g_ad, g_fd)


def test_tune_starting_state_recovers_x0():
    """tuneStartingState: the optimizer recovers the (unknown) initial
    state of an observed passive trajectory."""
    model, _, x0_true, obs = _observed_pendulum_traj(mass_scale=1.0)

    def match_loss(traj):
        return jnp.mean((traj.q - obs.q) ** 2) + jnp.mean((traj.v - obs.v) ** 2)

    # wrong initial guess for the start state
    prob = SingleShootingProblem(
        model=model,
        x0=State(q=jnp.asarray([0.1, 0.1]), v=jnp.zeros(2)),
        horizon=60, loss=match_loss, tune_start=True,
    )
    sol = jax.jit(
        lambda u: solve_single_shooting(prob, u_init=u, iters=500, lr=5e-2)
    )(jnp.zeros((60, 0)))
    assert float(sol.loss) < 1e-7, float(sol.loss)
    assert np.allclose(np.asarray(sol.params["x0q"]),
                       np.asarray(x0_true.q), atol=1e-2)


def test_lossfn_bounded_constraint():
    """A LossFn used as a bounded constraint (LossFn.hpp:46-70): minimize
    control effort subject to the pole ending upright."""
    model = builders.cartpole(dt=0.02)
    x0 = State(q=jnp.asarray([0.0, 0.15]), v=jnp.zeros(2))

    def effort(traj):
        return 1e-3 * jnp.mean(traj.u**2)

    def final_angle_sq(traj):
        return jnp.mean(traj.q[-10:, 1] ** 2) + 0.1 * jnp.mean(
            traj.v[-10:, 1] ** 2
        )

    prob = SingleShootingProblem(
        model=model, x0=x0, horizon=60, loss=effort,
        constraints=(((final_angle_sq), 0.0, 1e-3),),
    )
    sol = jax.jit(
        lambda u: solve_single_shooting(prob, u_init=u, iters=1800, lr=0.1)
    )(jnp.zeros((60, model.num_actions)))
    g = float(sol.constraint_values[0])
    # unconstrained minimum of `effort` is u=0, which leaves the pole
    # swinging at ~0.15 rad (g ~ 2e-2): the constraint drove it upright,
    # and the AL leaves it AT the bound, not far inside it
    assert g < 2e-3, g
    assert np.isfinite(float(sol.loss))

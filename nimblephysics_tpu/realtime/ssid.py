"""Online system identification — the `SSID` equivalent (dart/realtime/SSID.cpp).

The reference runs a parallel thread regressing masses/inertias from logged
sensor+control windows via the trajectory machinery with mass gradients
(`WithRespectTo::GROUP_MASSES`). Here the regression is direct: the model's
inertial parameters are differentiable pytree leaves, so the fit is Adam on
||rollout(params; q0, v0, u_window) − observed_states||² — one jitted solve.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.simulation.step import rollout


@dataclasses.dataclass(frozen=True)
class SSIDConfig:
    iters: int = 200
    lr: float = 5e-2
    log_space: bool = True   # optimize log-masses (positivity, scale-free)


class SSID:
    def __init__(self, model: Model, config: SSIDConfig = SSIDConfig()):
        self.model = model
        self.config = config

        def fit(theta0, q0, v0, us, obs_q, obs_v):
            opt = optax.adam(config.lr)

            def masses_of(theta):
                return jnp.exp(theta) if config.log_space else theta

            def loss(theta):
                m2 = self.model.replace(mass=masses_of(theta))
                _, traj = rollout(m2, State(q0, v0), us)
                return jnp.mean((traj.q - obs_q) ** 2) + jnp.mean(
                    (traj.v - obs_v) ** 2
                )

            def body(carry, _):
                theta, opt_state = carry
                val, g = jax.value_and_grad(loss)(theta)
                updates, opt_state = opt.update(g, opt_state, theta)
                return (optax.apply_updates(theta, updates), opt_state), val

            (theta, _), hist = jax.lax.scan(
                body, (theta0, opt.init(theta0)), None, length=config.iters
            )
            return masses_of(theta), hist

        self._fit = jax.jit(fit)

    def identify_masses(
        self, q0, v0, controls, observed_q, observed_v
    ) -> Tuple[jax.Array, jax.Array]:
        """Fit body masses to one logged window (`SSID::runPlotting` /
        `registerSensors`+`registerControls` analog). Returns (masses, loss
        history)."""
        m0 = self.model.mass
        theta0 = jnp.log(m0) if self.config.log_space else m0
        return self._fit(theta0, q0, v0, controls, observed_q, observed_v)

"""Parallel-equals-serial guarantees + f32 robustness.

Mirrors `unittests/comprehensive/test_ParallelOps.cpp` / `test_Concurrency.
cpp` (multithreaded MultiShot must equal serial results): here the claim is
vmapped/sharded solves equal their per-item serial counterparts."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.simulation.step import rollout, step
from nimblephysics_tpu.trajectory import ILQRConfig, ilqr_solve


def test_vmapped_rollout_equals_serial():
    model = builders.jump_worm(dt=0.002)
    rng = np.random.default_rng(0)
    B, T = 6, 40
    q0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, model.nq)))
    us = jnp.asarray(rng.standard_normal((B, T, model.num_actions)) * 10)

    batched = jax.jit(
        jax.vmap(lambda q, u: rollout(model, State(q, jnp.zeros(model.nq)), u)[0].q)
    )(q0s, us)
    for b in range(B):
        serial, _ = rollout(model, State(q0s[b], jnp.zeros(model.nq)), us[b])
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(serial.q), rtol=1e-10, atol=1e-10,
            err_msg=f"world {b}",
        )


def test_vmapped_ilqr_equals_serial():
    model = builders.cartpole(dt=0.02)
    from nimblephysics_tpu.models.model import relax_limits

    pm = relax_limits(model)
    rng = np.random.default_rng(1)
    B, T = 4, 20
    x0s = jnp.asarray(rng.uniform(-0.2, 0.2, (B, 4)))

    def running(x, u, t):
        return 0.1 * jnp.sum(x[:2] ** 2) + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 10.0 * jnp.sum(x**2)

    def solve(x0):
        return ilqr_solve(
            pm, State.from_flat(x0), jnp.zeros((T, 1)), running, final,
            ILQRConfig(iters=5),
        ).cost

    batched = jax.jit(jax.vmap(solve))(x0s)
    for b in range(B):
        serial = solve(x0s[b])
        np.testing.assert_allclose(
            float(batched[b]), float(serial), rtol=1e-8,
            err_msg=f"scenario {b}",
        )


def test_contact_gradients_finite_in_float32():
    """TPU production precision: gradients through frictional contact must
    stay finite in f32 (regression for the LCP jvp underflow)."""
    model = builders.jump_worm(dt=0.002)
    # build an f32 copy of the model
    f32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype") and
        jnp.issubdtype(x.dtype, jnp.floating) else x,
        model,
    )
    s_air = State(q=jnp.zeros(4, jnp.float32).at[2].set(1.2).at[3].set(1.2),
                  v=jnp.zeros(4, jnp.float32))
    s0, _ = rollout(f32, s_air, jnp.zeros((300, 2), jnp.float32))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((40, 2)) * 40, dtype=jnp.float32)

    def loss(u):
        final, traj = rollout(f32, State(s0.q, s0.v.at[2].set(2.0)), u)
        return jnp.sum(final.q**2) + 0.1 * jnp.sum(traj.v**2)

    val, g = jax.jit(jax.value_and_grad(loss))(u)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0

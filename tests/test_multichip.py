"""Multi-chip correctness with teeth (parallel-equals-serial standard,
test_ParallelOps.cpp analog, on the 8-virtual-device CPU mesh from
conftest.py — the same harness as the driver's dryrun_multichip).

Asserts sharded solves EQUAL the unsharded vmap solves elementwise at
realistic shapes, for both the contact-free path and the frozen-class
contact fast path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops.contact import contact_step, lcp_dim
from nimblephysics_tpu.ops.frozen_contact import rollout_classes
from nimblephysics_tpu.parallel.sharding import make_mesh, sharded_mpc_solves
from nimblephysics_tpu.trajectory.ilqr import ILQRConfig, ilqr_solve


needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


@needs_mesh
def test_sharded_mpc_equals_vmap_realistic_shapes():
    """Cartpole MPC at production-shape horizon (H=40, B=64, 6 iters):
    sharded-over-8-devices == single-device vmap, elementwise."""
    model = builders.cartpole(dt=0.02)
    nq, na = model.nq, model.num_actions
    H, B, iters = 40, 64, 6

    def running(x, u, t):
        return 1.0 * x[1] ** 2 + 0.1 * x[0] ** 2 + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 20.0 * x[1] ** 2 + jnp.sum(x[2:] ** 2)

    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.normal(0, 0.15, (B, 2 * nq)))
    u_warm = jnp.asarray(rng.normal(0, 0.05, (B, H, na)))

    mesh = make_mesh((("dp", 8),), jax.devices()[:8])
    solve = sharded_mpc_solves(model, mesh, running, final, horizon=H,
                               iters=iters)
    us_shard, mean_cost_shard = solve(x0, u_warm)

    def solve_one(x0f, uw):
        sol = ilqr_solve(model, State.from_flat(x0f), uw, running, final,
                         ILQRConfig(iters=iters))
        return sol.u, sol.cost

    us_ref, costs_ref = jax.jit(jax.vmap(solve_one))(x0, u_warm)

    np.testing.assert_allclose(
        np.asarray(us_shard), np.asarray(us_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        float(mean_cost_shard), float(np.mean(np.asarray(costs_ref))),
        rtol=1e-9,
    )


@needs_mesh
def test_sharded_contact_mpc_equals_vmap():
    """The frozen-class contact fast path on the mesh: jump-worm worlds
    with per-world mode sequences sharded over 8 devices must equal the
    single-device vmap solves elementwise."""
    model = builders.jump_worm(dt=0.001)
    nq, na = model.nq, model.num_actions
    H, B, iters = 16, 16, 3

    # settle onto the floor, then make B slightly different worlds
    s = State(q=jnp.zeros(nq).at[1].set(-0.45), v=jnp.zeros(nq))
    for _ in range(300):
        s = contact_step(model, s, jnp.zeros(nq))
    rng = np.random.default_rng(3)
    dq = jnp.asarray(rng.normal(0, 1e-3, (B, nq)))
    x0 = jnp.concatenate([s.q[None] + dq, jnp.tile(s.v[None], (B, 1))], axis=-1)
    u_warm = jnp.asarray(rng.normal(0, 1e-3, (B, H, na)))

    # per-world frozen mode sequences from full-LCP rollouts
    def classes_one(x0f, uw):
        st = State.from_flat(x0f)
        _, _, classes, _ = rollout_classes(model, st, uw)
        return classes

    classes = jax.jit(jax.vmap(classes_one))(x0, u_warm)
    assert classes.cmask.shape == (B, H, lcp_dim(model))

    d_act = model.actuated[0]
    q_target = s.q.at[d_act].add(0.2)

    def running(x, u, t):
        return 1e-6 * jnp.sum(u**2) + jnp.sum((x[:nq] - q_target) ** 2)

    def final(x):
        return 10.0 * jnp.sum((x[:nq] - q_target) ** 2)

    mesh = make_mesh((("dp", 8),), jax.devices()[:8])
    solve = sharded_mpc_solves(
        model, mesh, running, final, horizon=H, iters=iters,
        with_classes=True,
    )
    us_shard, mean_cost_shard = solve(x0, u_warm, classes)

    def solve_one(x0f, uw, cls):
        sol = ilqr_solve(model, State.from_flat(x0f), uw, running, final,
                         ILQRConfig(iters=iters), classes=cls)
        return sol.u, sol.cost

    us_ref, costs_ref = jax.jit(jax.vmap(solve_one))(x0, u_warm, classes)

    assert np.isfinite(np.asarray(us_ref)).all()
    np.testing.assert_allclose(
        np.asarray(us_shard), np.asarray(us_ref), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        float(mean_cost_shard), float(np.mean(np.asarray(costs_ref))),
        rtol=1e-9,
    )


@needs_mesh
def test_sharded_fused_contact_mpc_equals_unsharded_batch():
    """Config-5-shaped program: the FUSED batched pipeline
    (`solve_contact_mpc_batch` — full-LCP mode rollout + Pallas-fused
    frozen iLQR, exactly what bench.py times) running per-shard under
    shard_map must equal the same pipeline run unsharded on the full
    batch, elementwise (reference composition: MPCLocal::optimizePlan
    inside the MultiShot std::async fan-out)."""
    from nimblephysics_tpu.trajectory.ilqr import solve_contact_mpc_batch

    model = builders.jump_worm(dt=0.001)
    nq, na = model.nq, model.num_actions
    H, B, iters = 10, 16, 2

    s = State(q=jnp.zeros(nq).at[1].set(-0.45), v=jnp.zeros(nq))
    for _ in range(300):
        s = contact_step(model, s, jnp.zeros(nq))
    rng = np.random.default_rng(11)
    dq = jnp.asarray(rng.normal(0, 1e-3, (B, nq)))
    x0 = jnp.concatenate([s.q[None] + dq, jnp.tile(s.v[None], (B, 1))], axis=-1)
    u_warm = jnp.asarray(rng.normal(0, 1e-3, (B, H, na)))

    d_act = model.actuated[0]
    q_target = s.q.at[d_act].add(0.2)

    def running(x, u, t):
        return 1e-6 * jnp.sum(u**2) + jnp.sum((x[:nq] - q_target) ** 2)

    def final(x):
        return 10.0 * jnp.sum((x[:nq] - q_target) ** 2)

    cfg = ILQRConfig(iters=iters, alphas=(1.0, 0.3, 0.1), unroll=1)
    mesh = make_mesh((("dp", 8),), jax.devices()[:8])
    solve = sharded_mpc_solves(
        model, mesh, running, final, horizon=H, axis="dp",
        fused=True, contact=True, block_b=256, config=cfg,
    )
    us_shard, mean_cost_shard = solve(x0, u_warm)

    sol_ref, _ = jax.jit(
        lambda a, b: solve_contact_mpc_batch(
            model, a, b, running, final, cfg, outer_iters=1, block_b=256
        )
    )(x0, u_warm)

    assert np.isfinite(np.asarray(sol_ref.u)).all()
    np.testing.assert_allclose(
        np.asarray(us_shard), np.asarray(sol_ref.u), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        float(mean_cost_shard), float(np.mean(np.asarray(sol_ref.cost))),
        rtol=1e-9,
    )

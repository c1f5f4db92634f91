"""Solver-state checkpoint/resume (SURVEY §5.4): a paused solve resumed
from disk must land exactly where the unpaused solve lands."""

import numpy as np

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.trajectory.ilqr import ILQRConfig, ilqr_solve
from nimblephysics_tpu.utils.checkpoint import (
    checkpoint_meta,
    load_checkpoint,
    save_checkpoint,
)


def _problem():
    model = builders.cartpole(dt=0.02)

    def running(x, u, t):
        return x[1] ** 2 + 0.1 * x[0] ** 2 + 1e-3 * jnp.sum(u**2)

    def final(x):
        return 20.0 * jnp.sum(x**2)

    x0 = State(q=jnp.asarray([0.0, 0.25]), v=jnp.zeros(2))
    return model, x0, running, final


def test_resume_equals_straight_through(tmp_path):
    """iLQR 4+4 iterations with a save/load between legs == 8 straight.
    (Warm-started `Solution::reoptimize` semantics: the warm control
    sequence IS the solver state for a fresh-regularization leg.)"""
    model, x0, rc, fc = _problem()
    H = 30
    u0 = jnp.zeros((H, model.num_actions))

    sol_a = ilqr_solve(model, x0, u0, rc, fc, ILQRConfig(iters=4))
    ckpt = tmp_path / "solve.npz"
    save_checkpoint(str(ckpt), {"u": sol_a.u, "x0": x0},
                    meta={"iters_done": 4})
    assert checkpoint_meta(str(ckpt))["meta"]["iters_done"] == 4

    restored = load_checkpoint(str(ckpt), like={"u": u0, "x0": x0})
    sol_resumed = ilqr_solve(
        model, State(*restored["x0"]), restored["u"], rc, fc,
        ILQRConfig(iters=4),
    )
    sol_ref = ilqr_solve(
        model, x0, ilqr_solve(model, x0, u0, rc, fc, ILQRConfig(iters=4)).u,
        rc, fc, ILQRConfig(iters=4),
    )
    np.testing.assert_allclose(
        np.asarray(sol_resumed.u), np.asarray(sol_ref.u), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        float(sol_resumed.cost), float(sol_ref.cost), rtol=0
    )


def test_model_and_rng_roundtrip(tmp_path):
    """Model parameter pytrees (post-sysid) and RNG keys round-trip
    bit-exactly; static topology is unaffected."""
    model = builders.jump_worm(dt=0.001)
    m2 = model.replace(mass=model.mass * 1.37, gravity=jnp.asarray([0.0, -3.7, 0.0]))
    key = jax.random.PRNGKey(42)
    state = State(q=jnp.ones(model.nq) * 0.1, v=-jnp.ones(model.nq))
    ckpt = tmp_path / "world.npz"
    save_checkpoint(
        str(ckpt),
        {"model": m2, "state": state, "rng": jax.random.key_data(key)},
    )
    out = load_checkpoint(
        str(ckpt),
        like={"model": model, "state": state,
              "rng": jax.random.key_data(key)},
    )
    m3 = out["model"]
    np.testing.assert_array_equal(np.asarray(m3.mass), np.asarray(m2.mass))
    np.testing.assert_array_equal(
        np.asarray(m3.gravity), np.asarray(m2.gravity)
    )
    assert m3.joint_types == model.joint_types  # statics from `like`
    k2 = jax.random.wrap_key_data(out["rng"])
    np.testing.assert_array_equal(
        np.asarray(jax.random.uniform(key, (3,))),
        np.asarray(jax.random.uniform(k2, (3,))),
    )

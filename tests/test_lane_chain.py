"""Chained lane kernels (ops/lane_chain.py) — the humanoid-scale second
split. Verified here at a deliberately tiny budget on the half-cheetah so
the chains are multi-chunk on a model whose single-kernel path is the
trusted baseline (linearize_pallas_vjp). Covers: emitted-cost cut
selection, custom_linear_solve inlining, boundary remat, per-birth pack
emission units, and the chained step rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models.model import State


@pytest.fixture(scope="module")
def cheetah():
    from nimblephysics_tpu.ops.frozen_contact import (
        planner_reduce_contacts,
        rollout_classes,
    )
    from nimblephysics_tpu.utils.skel_parser import parse_skel

    model, s0 = parse_skel("/root/reference/data/skel/half_cheetah.skel")
    pl_ = planner_reduce_contacts(
        model, ["half_cheetah/b_foot", "half_cheetah/f_foot"])
    B, T = 2, 3
    x0 = jnp.tile(s0.flat()[None], (B, 1))
    u = 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                 (B, T, pl_.num_actions),
                                 dtype=x0.dtype)
    cls = jax.vmap(
        lambda xf, uu: rollout_classes(pl_, State.from_flat(xf), uu)[2]
    )(x0, u)
    return pl_, x0, u, cls


def test_chain_structure_under_budget(cheetah):
    from nimblephysics_tpu.ops.contact import lcp_dim
    from nimblephysics_tpu.ops.lane_chain import _chains_for

    pl_, x0, u, cls = cheetah
    nx = x0.shape[-1]
    ch = _chains_for(pl_, lcp_dim(pl_), nx, u.shape[-1], x0.dtype,
                     16, 8000)
    assert ch.pchain.n_chunks >= 3
    assert ch.tchain.n_chunks >= 2
    # every pack var leaves at its birth chunk: no unit is emitted by
    # the chain's final chunk unless born there
    assert all(un.rows > 0 for un in ch.units)
    # tangent boundaries stay small (the remat + extern design): far
    # below the packed primal cohort
    assert max(ch.tchain.bound_rows, default=0) < 4000


def test_chained_linearize_matches_single_kernel(cheetah):
    from nimblephysics_tpu.ops.lane_chain import chained_linearize_vjp
    from nimblephysics_tpu.ops.pallas_linearize import linearize_pallas_vjp

    pl_, x0, u, cls = cheetah
    B, T = u.shape[:2]
    nx = x0.shape[-1]
    xs = jnp.broadcast_to(x0[:, None, :], (B, T, nx))
    fx_c, fu_c = chained_linearize_vjp(
        pl_, xs, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)
    fx_r, fu_r = linearize_pallas_vjp(
        pl_, xs, u, (cls.cmask, cls.us), block_b=128, cg_iters=16)
    np.testing.assert_allclose(np.asarray(fx_c), np.asarray(fx_r),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fu_c), np.asarray(fu_r),
                               atol=1e-6)


def test_chained_step_rollout_matches_frozen_scan(cheetah):
    from nimblephysics_tpu.ops.frozen_contact import (
        FrozenClasses,
        frozen_contact_step,
    )
    from nimblephysics_tpu.ops.lane_chain import chained_step_rollout

    pl_, x0, u, cls = cheetah
    idx = jnp.asarray(pl_.actuated, dtype=jnp.int32)
    u_lo = jnp.asarray(pl_.tau_lower)[idx]
    u_hi = jnp.asarray(pl_.tau_upper)[idx]

    def rc(x, uu, t):
        return 1e-4 * jnp.sum(uu ** 2) + x[0] ** 2

    xs_c, cost_c = chained_step_rollout(
        pl_, rc, x0, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)

    def ref_roll(x0f, uu, cm, us):
        def body(x, inp):
            ut, c1, u1 = inp
            tau = pl_.action_to_tau(jnp.clip(ut, u_lo, u_hi))
            s2 = frozen_contact_step(
                pl_, State.from_flat(x), tau, FrozenClasses(c1, u1),
                cg_iters=16)
            return s2.flat(), s2.flat()

        _, xs_ = jax.lax.scan(body, x0f, (uu, cm, us))
        return jnp.concatenate([x0f[None], xs_], 0)

    xs_r = jax.vmap(ref_roll)(x0, u, cls.cmask, cls.us)
    np.testing.assert_allclose(np.asarray(xs_c), np.asarray(xs_r),
                               atol=2e-6)


def test_chained_linearize_segmented_outputs(cheetah, monkeypatch):
    """Chunks whose flat output row space exceeds NTPU_CHAIN_OUT_SEG_ROWS
    emit through multiple launches (each re-running the chunk, writing one
    row window) — the round-5 fix for the Atlas p6 compile crash (25 MB
    output blocks; BIGMODEL_STUDY.md). Forced tiny here so several cheetah
    chunks segment; must match the unsegmented chain exactly."""
    from nimblephysics_tpu.ops.lane_chain import chained_linearize_vjp

    pl_, x0, u, cls = cheetah
    B, T = u.shape[:2]
    nx = x0.shape[-1]
    xs = jnp.broadcast_to(x0[:, None, :], (B, T, nx))
    monkeypatch.setenv("NTPU_CHAIN_OUT_SEG_ROWS", "250")
    fx_s, fu_s = chained_linearize_vjp(
        pl_, xs, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)
    monkeypatch.setenv("NTPU_CHAIN_OUT_SEG_ROWS", "99999999")
    fx_r, fu_r = chained_linearize_vjp(
        pl_, xs, u, (cls.cmask, cls.us), cg_iters=16, budget=8000)
    np.testing.assert_allclose(np.asarray(fx_s), np.asarray(fx_r),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(fu_s), np.asarray(fu_r),
                               atol=1e-7)

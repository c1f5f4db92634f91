"""Pallas batched-PGS kernel vs the XLA solver (interpret mode on CPU;
bit-exact on TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.ops import lcp as lcp_mod
from nimblephysics_tpu.ops.pallas_lcp import pallas_pgs_batched


def test_pallas_pgs_matches_xla():
    rng = np.random.default_rng(0)
    B, nc = 16, 2
    m = 3 * nc
    G = rng.standard_normal((B, m, m + 3))
    A = np.einsum("bij,bkj->bik", G, G) / m + 1e-2 * np.eye(m)
    b = rng.standard_normal((B, m))
    lo = np.zeros((B, m))
    hi = np.full((B, m), 1e20)
    fs = np.zeros((B, m))
    findex = []
    for k in range(nc):
        findex.extend([-1, 3 * k, 3 * k])
        fs[:, 3 * k + 1] = 0.7
        fs[:, 3 * k + 2] = 0.7
        hi[:, 3 * k + 1] = 0.0
        hi[:, 3 * k + 2] = 0.0
    findex = tuple(findex)

    args = tuple(map(jnp.asarray, (A, b, lo, hi, fs, np.zeros((B, m)))))
    x_xla = jax.vmap(
        lambda A, b, lo, hi, fs, x0: lcp_mod.pgs_solve(
            A, b, lo, hi, fs, x0, findex, 60
        )
    )(*args)
    x_pal = pallas_pgs_batched(*args, findex, 60, block_b=16)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_xla), atol=1e-10)


def _seq_backward(fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT, reg):
    """The sequential Riccati recursion (trajectory/ilqr.py bstep) as the
    spec for the Pallas kernel."""
    from nimblephysics_tpu.ops import linalg_small

    T, nx = fx.shape[0], fx.shape[1]
    Vx, Vxx = VxT, VxxT
    Ks, ks, oks = [], [], []
    dV = jnp.zeros(2)
    for t in reversed(range(T)):
        Qx = lx[t] + fx[t].T @ Vx
        Qu = lu[t] + fu[t].T @ Vx
        Qxx = lxx[t] + fx[t].T @ Vxx @ fx[t]
        Quu = luu[t] + fu[t].T @ Vxx @ fu[t]
        Qux = lux[t] + fu[t].T @ Vxx @ fx[t]
        Vxx_reg = Vxx + reg * jnp.eye(nx)
        Quu_reg = luu[t] + fu[t].T @ Vxx_reg @ fu[t]
        Qux_reg = lux[t] + fu[t].T @ Vxx_reg @ fx[t]
        Quu_inv, min_piv = linalg_small.inv_spd_pivots(Quu_reg)
        ok = jnp.isfinite(min_piv) & (min_piv > 0.0)
        k_t = -(Quu_inv @ Qu)
        K_t = -(Quu_inv @ Qux_reg)
        Vx = Qx + K_t.T @ Quu @ k_t + K_t.T @ Qu + Qux.T @ k_t
        Vxx = Qxx + K_t.T @ Quu @ K_t + K_t.T @ Qux + Qux.T @ K_t
        Vxx = 0.5 * (Vxx + Vxx.T)
        dV = dV + jnp.array([k_t @ Qu, 0.5 * k_t @ Quu @ k_t])
        Ks.append(K_t)
        ks.append(k_t)
        oks.append(ok)
    Ks.reverse()
    ks.reverse()
    return jnp.stack(Ks), jnp.stack(ks), dV, jnp.all(jnp.stack(oks))


def test_pallas_riccati_matches_sequential():
    from nimblephysics_tpu.ops.pallas_riccati import riccati_backward_pallas

    rng = np.random.default_rng(1)
    for nx, na, T, B in [(4, 1, 9, 5), (6, 3, 4, 2)]:
        fx = 0.1 * rng.standard_normal((B, T, nx, nx)) + np.eye(nx)
        fu = 0.3 * rng.standard_normal((B, T, nx, na))
        lx = rng.standard_normal((B, T, nx))
        lu = rng.standard_normal((B, T, na))
        G = rng.standard_normal((B, T, nx, nx))
        lxx = np.einsum("btij,btkj->btik", G, G) / nx + 0.1 * np.eye(nx)
        Ga = rng.standard_normal((B, T, na, na))
        luu = np.einsum("btij,btkj->btik", Ga, Ga) / na + 0.5 * np.eye(na)
        lux = 0.1 * rng.standard_normal((B, T, na, nx))
        VxT = rng.standard_normal((B, nx))
        Gx = rng.standard_normal((B, nx, nx))
        VxxT = np.einsum("bij,bkj->bik", Gx, Gx) / nx + 0.1 * np.eye(nx)
        reg = np.abs(rng.standard_normal(B)) * 0.1 + 1e-3

        args = [jnp.asarray(a, jnp.float32) for a in
                (fx, fu, lx, lu, lxx, luu, lux, VxT, VxxT, reg)]
        K_p, k_p, dV_p, ok_p = riccati_backward_pallas(*args, block_b=8)
        K_s, k_s, dV_s, ok_s = jax.vmap(_seq_backward)(*args)
        np.testing.assert_allclose(np.asarray(K_p), np.asarray(K_s),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(k_p), np.asarray(k_s),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dV_p), np.asarray(dV_s),
                                   rtol=2e-4, atol=2e-4)
        assert (np.asarray(ok_p) == np.asarray(ok_s)).all()


def test_ilqr_solve_batch_matches_vmap():
    """The natively batched Pallas-backward iLQR takes the same optimization
    trajectory as vmap(ilqr_solve) (reference parity model:
    test_ParallelOps/test_Concurrency — parallel equals serial)."""
    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.models.model import State, relax_limits
    from nimblephysics_tpu.trajectory.ilqr import (
        ILQRConfig, ilqr_solve, ilqr_solve_batch,
    )

    model = relax_limits(builders.cartpole(dt=0.02))
    nq, na = model.nq, model.num_actions
    H, B = 12, 4
    cfg = ILQRConfig(iters=4, unroll=4)

    def running(x, u, t):
        return 0.1 * jnp.sum(x[:nq] ** 2) + 1e-3 * jnp.sum(u ** 2)

    def final(x):
        return 10.0 * jnp.sum(x ** 2)

    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (B, 2 * nq), minval=-0.3, maxval=0.3)
    u0 = jnp.zeros((B, H, na))

    sol_v = jax.vmap(
        lambda x, u: ilqr_solve(model, State.from_flat(x), u, running, final, cfg)
    )(x0, u0)
    sol_b = ilqr_solve_batch(model, x0, u0, running, final, cfg, block_b=8)
    np.testing.assert_allclose(np.asarray(sol_b.cost), np.asarray(sol_v.cost),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol_b.u), np.asarray(sol_v.u),
                               rtol=1e-3, atol=1e-4)

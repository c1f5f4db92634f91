"""Function objects, Gaussians, assignment, smoothers."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline
from scipy.stats import multivariate_normal

from nimblephysics_tpu.ops.functions import (
    PiecewiseLinearFunction,
    PolynomialFunction,
    SimmSpline,
    derivative,
    second_derivative,
    simm_spline,
)
from nimblephysics_tpu.ops.stats import (
    MultivariateGaussian,
    acceleration_smoother,
    assignment_matcher,
    velocity_minimizing_smoother,
)


def test_simm_spline_matches_scipy_natural_cubic():
    xs = np.asarray([0.0, 0.7, 1.3, 2.1, 3.0])
    ys = np.sin(xs) + 0.1 * xs**2
    sp = simm_spline(xs, ys)
    ref = CubicSpline(xs, ys, bc_type="natural")
    for x in [0.0, 0.35, 1.0, 1.9, 2.95]:
        assert abs(float(sp(jnp.asarray(x))) - float(ref(x))) < 1e-10
        assert abs(float(derivative(sp, jnp.asarray(x))) - float(ref(x, 1))) < 1e-8
        assert (
            abs(float(second_derivative(sp, jnp.asarray(x))) - float(ref(x, 2)))
            < 1e-7
        )
    # knots are interpolated exactly
    for x, y in zip(xs, ys):
        assert abs(float(sp(jnp.asarray(x))) - y) < 1e-12
    # linear extrapolation continues the boundary slope
    s = float(derivative(sp, jnp.asarray(0.0)))
    assert abs(float(sp(jnp.asarray(-0.5))) - (ys[0] - 0.5 * s)) < 1e-9


def test_polynomial_and_piecewise():
    p = PolynomialFunction(coeffs=jnp.asarray([1.0, -2.0, 0.5]))
    x = jnp.asarray(1.3)
    assert abs(float(p(x)) - (1.0 - 2.0 * 1.3 + 0.5 * 1.3**2)) < 1e-12
    assert abs(float(derivative(p, x)) - (-2.0 + 1.0 * 1.3)) < 1e-12
    pl = PiecewiseLinearFunction(
        xs=jnp.asarray([0.0, 1.0, 2.0]), ys=jnp.asarray([0.0, 2.0, 1.0])
    )
    assert abs(float(pl(jnp.asarray(0.5))) - 1.0) < 1e-12
    assert abs(float(pl(jnp.asarray(1.5))) - 1.5) < 1e-12


def test_multivariate_gaussian_logpdf_and_condition():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 4))
    cov = A @ A.T + 4 * np.eye(4)
    mean = rng.standard_normal(4)
    g = MultivariateGaussian(jnp.asarray(mean), jnp.asarray(cov))
    x = rng.standard_normal(4)
    ref = multivariate_normal(mean=mean, cov=cov).logpdf(x)
    assert abs(float(g.logpdf(jnp.asarray(x))) - ref) < 1e-9

    cond = g.condition([1, 3], jnp.asarray([0.5, -0.2]))
    # conditional of a Gaussian: compare against the standard formula
    obs, free = np.asarray([1, 3]), np.asarray([0, 2])
    K = cov[np.ix_(free, obs)] @ np.linalg.inv(cov[np.ix_(obs, obs)])
    mu_ref = mean[free] + K @ (np.asarray([0.5, -0.2]) - mean[obs])
    np.testing.assert_allclose(np.asarray(cond.mean), mu_ref, atol=1e-10)


def test_assignment_matcher():
    cost = np.asarray([[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]])
    out = assignment_matcher(cost)
    assert sorted(out.tolist()) == [0, 1, 2]
    assert cost[np.arange(3), out].sum() == 5.0  # known optimum


def test_smoothers_reduce_roughness():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 50)
    clean = np.sin(2 * np.pi * t)[:, None]
    noisy = clean + 0.1 * rng.standard_normal((50, 1))
    sm = np.asarray(acceleration_smoother(jnp.asarray(noisy), 10.0))
    acc = lambda x: np.diff(x, 2, axis=0)
    assert np.abs(acc(sm)).sum() < 0.5 * np.abs(acc(noisy)).sum()
    assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()
    sv = np.asarray(velocity_minimizing_smoother(jnp.asarray(noisy), 5.0))
    vel = lambda x: np.diff(x, 1, axis=0)
    assert np.abs(vel(sv)).sum() < np.abs(vel(noisy)).sum()


def test_lemke_solves_random_psd_lcps_and_matches_pgs():
    """Standalone Lemke solver (role parity: dart/lcpsolver/Lemke.cpp) —
    complementarity on random PSD LCPs, agreement with the production PGS
    solver on the same problems."""
    from nimblephysics_tpu.ops.lcp import pgs_solve
    from nimblephysics_tpu.ops.lemke import lemke

    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(1, 9))
        A = rng.standard_normal((n, n))
        M = A @ A.T + 0.1 * np.eye(n)
        q = rng.standard_normal(n)
        z, status = lemke(M, q)
        w = M @ z + q
        assert status == 0
        assert z.min() >= -1e-8 and w.min() >= -1e-7
        assert abs(z @ w) < 1e-6
        # PGS (boxed with [0, inf) bounds) must find the same solution of
        # the strictly monotone LCP
        inf = jnp.full(n, jnp.inf)
        z_pgs = pgs_solve(
            jnp.asarray(M), jnp.asarray(-q), jnp.zeros(n), inf,
            jnp.ones(n), jnp.zeros(n), tuple([-1] * n), iters=400,
        )
        np.testing.assert_allclose(np.asarray(z_pgs), z, atol=5e-4)

"""Statistical & combinatorial math utilities.

Maps `dart/math/MultivariateGaussian` (anthropometric priors),
`dart/math/AssignmentMatcher` (bipartite marker labeling), and the
`AccelerationSmoother`/`VelocityMinimizingSmoother` trajectory filters in
`dart/utils/`.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class MultivariateGaussian(NamedTuple):
    """Gaussian with convenience logpdf + conditioning, used as the
    anthropometric prior regularizer (`Anthropometrics`)."""

    mean: jax.Array        # (n,)
    cov: jax.Array         # (n, n)

    def logpdf(self, x: jax.Array) -> jax.Array:
        n = self.mean.shape[0]
        delta = x - self.mean
        chol = jnp.linalg.cholesky(self.cov)
        sol = jax.scipy.linalg.cho_solve((chol, True), delta)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (n * jnp.log(2.0 * jnp.pi) + logdet + delta @ sol)

    def condition(self, observed_idx: Sequence[int], values: jax.Array):
        """Condition on a subset of variables; returns the Gaussian over the
        remaining ones (`MultivariateGaussian::condition`)."""
        n = self.mean.shape[0]
        obs = np.asarray(observed_idx, dtype=np.int64)
        free = np.asarray([i for i in range(n) if i not in set(obs.tolist())])
        mu_f, mu_o = self.mean[free], self.mean[obs]
        S_ff = self.cov[np.ix_(free, free)]
        S_fo = self.cov[np.ix_(free, obs)]
        S_oo = self.cov[np.ix_(obs, obs)]
        K = S_fo @ jnp.linalg.inv(S_oo)
        return MultivariateGaussian(
            mean=mu_f + K @ (values - mu_o),
            cov=S_ff - K @ S_fo.T,
        )


def assignment_matcher(cost: np.ndarray) -> np.ndarray:
    """Min-cost bipartite assignment (`math::AssignmentMatcher`), host-side:
    returns col index per row (-1 for unassigned rows when cols < rows)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost, dtype=np.float64)
    rows, cols = linear_sum_assignment(cost)
    out = np.full(cost.shape[0], -1, dtype=np.int64)
    out[rows] = cols
    return out


def acceleration_smoother(series: jax.Array, smoothing: float) -> jax.Array:
    """`AccelerationSmoother` (dart/utils): minimize
    ||x − series||² + smoothing ||D² x||² over the time axis — a banded
    least-squares solve, here dense (T is small in the fitting pipelines).

    series: (T, d)."""
    T = series.shape[0]
    dtype = series.dtype
    eye = jnp.eye(T, dtype=dtype)
    D2 = (
        jnp.diag(jnp.full(T - 2, 1.0, dtype), 0)
        @ jnp.zeros((T - 2, T), dtype)
        if T < 3
        else (
            jnp.eye(T - 2, T, 0, dtype=dtype)
            - 2.0 * jnp.eye(T - 2, T, 1, dtype=dtype)
            + jnp.eye(T - 2, T, 2, dtype=dtype)
        )
    )
    A = eye + smoothing * D2.T @ D2
    return jnp.linalg.solve(A, series)


def velocity_minimizing_smoother(series: jax.Array, smoothing: float) -> jax.Array:
    """`VelocityMinimizingSmoother`: penalize first differences instead."""
    T = series.shape[0]
    dtype = series.dtype
    D1 = jnp.eye(T - 1, T, 0, dtype=dtype) - jnp.eye(T - 1, T, 1, dtype=dtype)
    A = jnp.eye(T, dtype=dtype) + smoothing * D1.T @ D1
    return jnp.linalg.solve(A, series)

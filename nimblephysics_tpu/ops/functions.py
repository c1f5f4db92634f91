"""Differentiable 1-D function objects — `dart/math/CustomFunction` family.

The reference's biomech-specific joints (`CustomJoint.hpp:56-95`) drive
coordinates through these functions; OpenSim models use `SimmSpline`
(natural cubic through knots) heavily. Each function here is a pytree
(coefficients are leaves) with calc/derivative evaluated by closed form —
JAX AD supplies the derivatives the reference hand-codes
(`calcDerivative`, `calcSecondDerivative`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PolynomialFunction(NamedTuple):
    """f(x) = sum_i coeffs[i] x^i (dart/math/PolynomialFunction)."""

    coeffs: jax.Array

    def __call__(self, x):
        return jnp.polyval(self.coeffs[::-1], x)


class LinearFunction(NamedTuple):
    """f(x) = slope x + intercept."""

    slope: jax.Array
    intercept: jax.Array

    def __call__(self, x):
        return self.slope * x + self.intercept


class ConstantFunction(NamedTuple):
    value: jax.Array

    def __call__(self, x):
        return self.value + 0.0 * x


class PiecewiseLinearFunction(NamedTuple):
    """Linear interpolation through (xs, ys), clamped-slope extrapolation
    (dart/math/PiecewiseLinearFunction)."""

    xs: jax.Array
    ys: jax.Array

    def __call__(self, x):
        return jnp.interp(x, self.xs, self.ys)


class SimmSpline(NamedTuple):
    """OpenSim's natural cubic spline through knots (dart/math/SimmSpline,
    from OpenSim's simmSpline.c). Natural boundary conditions (second
    derivative zero at the ends); linear extrapolation outside the knots.

    c2: precomputed second derivatives at the knots (build with
    `simm_spline`)."""

    xs: jax.Array
    ys: jax.Array
    c2: jax.Array

    def __call__(self, x):
        xs, ys, c2 = self.xs, self.ys, self.c2
        n = xs.shape[0]
        j = jnp.clip(jnp.searchsorted(xs, x) - 1, 0, n - 2)
        h = xs[j + 1] - xs[j]
        a = (xs[j + 1] - x) / h
        b = (x - xs[j]) / h
        y_in = (
            a * ys[j]
            + b * ys[j + 1]
            + ((a**3 - a) * c2[j] + (b**3 - b) * c2[j + 1]) * h * h / 6.0
        )
        # linear extrapolation with the boundary slope
        s0 = (ys[1] - ys[0]) / (xs[1] - xs[0]) - (xs[1] - xs[0]) / 6.0 * (
            2 * c2[0] + c2[1]
        )
        sn = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2]) + (xs[-1] - xs[-2]) / 6.0 * (
            2 * c2[-1] + c2[-2]
        )
        y_lo = ys[0] + s0 * (x - xs[0])
        y_hi = ys[-1] + sn * (x - xs[-1])
        return jnp.where(x < xs[0], y_lo, jnp.where(x > xs[-1], y_hi, y_in))


def simm_spline(xs, ys) -> SimmSpline:
    """Construct a natural cubic spline (solves the tridiagonal system for
    knot second-derivatives on the host)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = xs.shape[0]
    if n == 2:
        c2 = np.zeros(2)
    else:
        h = np.diff(xs)
        A = np.zeros((n, n))
        rhs = np.zeros(n)
        A[0, 0] = 1.0
        A[-1, -1] = 1.0
        for i in range(1, n - 1):
            A[i, i - 1] = h[i - 1]
            A[i, i] = 2.0 * (h[i - 1] + h[i])
            A[i, i + 1] = h[i]
            rhs[i] = 6.0 * (
                (ys[i + 1] - ys[i]) / h[i] - (ys[i] - ys[i - 1]) / h[i - 1]
            )
        c2 = np.linalg.solve(A, rhs)
    return SimmSpline(xs=jnp.asarray(xs), ys=jnp.asarray(ys), c2=jnp.asarray(c2))


# ---------------------------------------------------------------------------
# Hashable function SPECS: plain nested tuples usable as static jit metadata
# (CustomJoint drive functions compile to constants). Kinds:
#   ("constant", v) | ("linear", slope, intercept) | ("poly", coeffs...)
#   ("spline", xs, ys, c2)  — natural cubic, c2 from build_spline_spec
#   ("multiplier", inner_spec, scale)
# ---------------------------------------------------------------------------


def build_spline_spec(xs, ys) -> tuple:
    sp = simm_spline(xs, ys)
    return (
        "spline",
        tuple(float(v) for v in np.asarray(sp.xs)),
        tuple(float(v) for v in np.asarray(sp.ys)),
        tuple(float(v) for v in np.asarray(sp.c2)),
    )


def eval_fn_spec(spec: tuple, x):
    """Evaluate a hashable function spec at traced x (differentiable)."""
    kind = spec[0]
    if kind == "constant":
        return jnp.asarray(spec[1], dtype=jnp.result_type(x)) + 0.0 * x
    if kind == "linear":
        return spec[1] * x + spec[2]
    if kind == "poly":
        return jnp.polyval(jnp.asarray(spec[1][::-1]), x)
    if kind == "spline":
        sp = SimmSpline(
            xs=jnp.asarray(spec[1]), ys=jnp.asarray(spec[2]), c2=jnp.asarray(spec[3])
        )
        return sp(x)
    if kind == "multiplier":
        return spec[2] * eval_fn_spec(spec[1], x)
    raise ValueError(f"unknown function spec {kind!r}")


def derivative(fn, x):
    """d fn / dx at x (reference `calcDerivative`) via AD."""
    return jax.grad(lambda z: fn(z))(x)


def second_derivative(fn, x):
    return jax.grad(jax.grad(lambda z: fn(z)))(x)

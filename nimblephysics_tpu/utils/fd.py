"""Finite-difference harness — the ground-truth oracle for every analytic
derivative, mirroring the reference's test philosophy
(`dart/math/FiniteDifference.hpp:19-57`, `unittests/GradientTestUtils.hpp`):
every analytical Jacobian ships with an FD twin and a tolerance test.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def fd_jacobian(f: Callable, x: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Central-difference Jacobian of f: R^n -> R^m, returns (m, n)."""
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x), dtype=np.float64)
    out = np.zeros(y0.shape + x.shape, dtype=np.float64)
    for i in range(x.size):
        idx = np.unravel_index(i, x.shape)
        dx = np.zeros_like(x)
        dx[idx] = eps
        yp = np.asarray(f(x + dx), dtype=np.float64)
        ym = np.asarray(f(x - dx), dtype=np.float64)
        out[..., *idx] = (yp - ym) / (2 * eps)
    return out.reshape(y0.size, x.size)


def fd_grad(f: Callable, x: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Central-difference gradient of scalar f."""
    return fd_jacobian(lambda z: np.asarray([f(z)]), x, eps)[0]


def ridders_jacobian(f: Callable, x: np.ndarray, h0: float = 1e-3) -> np.ndarray:
    """Ridders' polynomial-extrapolated differencing (higher accuracy than
    plain central differences; FiniteDifference.hpp's `ridders=true` path)."""
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x), dtype=np.float64)
    m, n = y0.size, x.size
    out = np.zeros((m, n))
    ntab, con, safe = 10, 1.4, 2.0
    for i in range(n):
        dx = np.zeros_like(x)
        a = np.zeros((ntab, ntab, m))
        hh = h0
        dx[np.unravel_index(i, x.shape)] = hh
        a[0, 0] = (np.asarray(f(x + dx)) - np.asarray(f(x - dx))).ravel() / (2 * hh)
        err = np.inf
        best = a[0, 0]
        for j in range(1, ntab):
            hh /= con
            dx[:] = 0
            dx[np.unravel_index(i, x.shape)] = hh
            a[0, j] = (np.asarray(f(x + dx)) - np.asarray(f(x - dx))).ravel() / (2 * hh)
            fac = con * con
            for k in range(1, j + 1):
                a[k, j] = (a[k - 1, j] * fac - a[k - 1, j - 1]) / (fac - 1.0)
                fac *= con * con
                errt = max(
                    np.max(np.abs(a[k, j] - a[k - 1, j])),
                    np.max(np.abs(a[k, j] - a[k - 1, j - 1])),
                )
                if errt <= err:
                    err = errt
                    best = a[k, j]
            if np.max(np.abs(a[j, j] - a[j - 1, j - 1])) >= safe * err:
                break
        out[:, i] = best
    return out

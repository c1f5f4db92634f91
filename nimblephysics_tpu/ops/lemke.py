"""Standalone Lemke complementary-pivot LCP solver (host-side oracle).

Role parity with the reference's `dart/lcpsolver/Lemke.{hpp,cpp}` (a
Lemke solver kept for tests and as an independent check on the boxed-LCP
pipeline). Like the reference's, this is NOT the production solve path —
the batched PGS / direct active-set solvers in `ops/lcp.py` (and the
Pallas kernel in `ops/pallas_lcp.py`) are — so it is deliberately a plain
NumPy implementation: exact pivoting with data-dependent control flow is
the one LCP algorithm that does not map to fixed-shape XLA programs, which
is precisely why the TPU design replaces it (SURVEY.md §7 hard part 2).

Solves: w = M z + q, w ≥ 0, z ≥ 0, wᵀz = 0 via Lemke's algorithm with a
covering ray (Murty, "Linear Complementarity, Linear and Nonlinear
Programming", ch. 2; same algorithm as the reference's Lemke.cpp:59+).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lemke"]


def lemke(M: np.ndarray, q: np.ndarray, max_pivots: int = 200,
          zero_tol: float = 1e-10):
    """Solve the LCP (M, q). Returns (z, status) with status 0 on success,
    1 on ray termination (secondary ray — no solution found), 2 on pivot
    limit."""
    M = np.asarray(M, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n = q.shape[0]
    if np.all(q >= -zero_tol):
        return np.zeros(n), 0

    # Tableau: columns [B | -M | -d | q] over basis bookkeeping.
    # basis[i] holds the variable index occupying row i:
    #   0..n-1   -> w_i
    #   n..2n-1  -> z_{i-n}
    #   2n       -> z0 (artificial / covering variable)
    d = np.ones(n)
    T = np.hstack([np.eye(n), -M, -d[:, None], q[:, None]])
    basis = list(range(n))

    # Initial pivot: bring z0 in, drop the most negative w.
    row = int(np.argmin(q))
    entering = 2 * n
    for _ in range(max_pivots):
        # pivot on (row, entering)
        piv = T[row, entering]
        if abs(piv) < zero_tol:
            return _extract(basis, T, n), 1
        T[row] /= piv
        for r in range(n):
            if r != row and abs(T[r, entering]) > 0:
                T[r] -= T[r, entering] * T[row]
        leaving = basis[row]
        basis[row] = entering
        if entering == 2 * n or leaving == 2 * n:
            if leaving == 2 * n:
                return _extract(basis, T, n), 0
            # z0 just entered: next entering var is the complement of the
            # variable that left
            entering_next = leaving + n if leaving < n else leaving - n
        else:
            entering_next = leaving + n if leaving < n else leaving - n

        # minimum-ratio test over rows with positive column entry
        col = T[:, entering_next]
        rhs = T[:, -1]
        ratios = np.full(n, np.inf)
        pos = col > zero_tol
        ratios[pos] = rhs[pos] / col[pos]
        if not np.any(np.isfinite(ratios)):
            return _extract(basis, T, n), 1  # unbounded ray
        # Bland-ish tie-break: prefer dropping z0 when tied, else smallest
        # basis index (prevents cycling on degenerate problems)
        rmin = np.min(ratios)
        tied = [r for r in range(n) if ratios[r] <= rmin + zero_tol]
        row = tied[0]
        for r in tied:
            if basis[r] == 2 * n:
                row = r
                break
        entering = entering_next
        if basis[row] == 2 * n and entering != 2 * n:
            # z0 leaves on this pivot -> will terminate next loop
            pass
    return _extract(basis, T, n), 2


def _extract(basis, T, n):
    z = np.zeros(n)
    rhs = T[:, -1]
    for i, b in enumerate(basis):
        if n <= b < 2 * n:
            z[b - n] = rhs[i]
    return np.clip(z, 0.0, None)

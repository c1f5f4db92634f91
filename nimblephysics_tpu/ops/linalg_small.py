"""Unrolled small-matrix linear algebra for TPU hot loops.

`jnp.linalg.inv/solve/cholesky` lower on XLA:TPU to LU/Cholesky loops with
row pivoting and dynamic slices — a long serial chain of tiny ops that is
catastrophic inside `lax.scan` bodies (measured 7x slower than pivot-free
elimination in the parallel-Riccati kernel, and it sat on the ABA critical
path via the per-joint D⁻¹). Every matrix these helpers see is SPD (or a
benign identity-padded SPD block): joint-space articulated inertia D in
ABA, Quu in Riccati, Q'Q in the LCP implicit rule — so pivot-free
Gauss-Jordan is numerically safe, and its pivots double as a positive-
definiteness certificate (for symmetric A the k-th pivot is the ratio of
leading principal minors det(A_k)/det(A_{k-1}), all positive iff A ≻ 0 —
the role `jnp.linalg.cholesky` NaN-checks played, without the serial
factorization).

All functions unroll over the STATIC matrix size: n GJ steps of fused
rank-1 broadcast updates (VPU work; no dynamic slicing, no pivot gather).
Intended for n ≲ 16; above that prefer `jnp.linalg`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
import jax.numpy as jnp


def inv_spd_pivots(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(A⁻¹, min pivot) for SPD A (..., n, n), pivot-free Gauss-Jordan.

    min pivot > 0 certifies positive definiteness (NaN/negative on
    indefinite input — same signal as a NaN Cholesky)."""
    n = A.shape[-1]
    if n == 1:
        piv = A[..., 0, 0]
        return 1.0 / piv[..., None, None], piv
    # ROW-DECOMPOSED Gauss-Jordan: the augmented [A | I] is held as n
    # separate (..., 2n) row values and each elimination updates rows
    # independently. Mathematically identical to the matrix form (same
    # rank-1 updates, pivot reciprocal multiplied instead of divided), but
    # the emitted graph contains only small per-row ops — the monolithic
    # (n, 2n) chained form made the Mosaic compile helper crash outright
    # for n=27 inside the lane kernels (round-3 bisect: three chained
    # (27,54,...) pivot-divide iterations were already fatal, while the
    # full 27-step row form compiles in ~20s).
    eye_np = np.eye(n)
    rows = [
        jnp.concatenate(
            [A[..., k, :],
             jnp.zeros_like(A[..., k, :]) + jnp.asarray(eye_np[k], A.dtype)],
            axis=-1,
        )
        for k in range(n)
    ]
    min_piv = None
    for k in range(n):
        piv = rows[k][..., k]
        min_piv = piv if min_piv is None else jnp.minimum(min_piv, piv)
        prow = rows[k] * (1.0 / piv)[..., None]
        rows = [
            prow if i == k else rows[i] - rows[i][..., k:k + 1] * prow
            for i in range(n)
        ]
    return jnp.stack([r[..., n:] for r in rows], axis=-2), min_piv


def inv_spd(A: jax.Array) -> jax.Array:
    return inv_spd_pivots(A)[0]


def solve_spd(A: jax.Array, b: jax.Array) -> jax.Array:
    """A⁻¹ b for SPD A (..., n, n) with b (..., n) or (..., n, k)."""
    Ai = inv_spd(A)
    if b.ndim == A.ndim - 1:
        return (Ai @ b[..., None])[..., 0]
    return Ai @ b

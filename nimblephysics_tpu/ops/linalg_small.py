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
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, eye], axis=-1)            # (..., n, 2n)
    min_piv = None
    eye_np = np.eye(n)
    for k in range(n):
        piv = M[..., k, k]
        min_piv = piv if min_piv is None else jnp.minimum(min_piv, piv)
        row = M[..., k, :] / piv[..., None]
        M = M - M[..., :, k:k + 1] * row[..., None, :]
        # write row k back additively: after the rank-1 update row k is
        # zero (to rounding), so + e_k⊗row == .at[k].set(row) — but stays
        # scatter-free (scatter is serial on TPU and unsupported in the
        # lane kernels, ops/lanevmap.py)
        oh = jnp.asarray(eye_np[k][:, None], dtype=A.dtype)
        M = M + oh * row[..., None, :]
    return M[..., :, n:], min_piv


def inv_spd(A: jax.Array) -> jax.Array:
    return inv_spd_pivots(A)[0]


def solve_spd(A: jax.Array, b: jax.Array) -> jax.Array:
    """A⁻¹ b for SPD A (..., n, n) with b (..., n) or (..., n, k)."""
    Ai = inv_spd(A)
    if b.ndim == A.ndim - 1:
        return (Ai @ b[..., None])[..., 0]
    return Ai @ b

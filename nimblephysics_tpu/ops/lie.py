"""SO(3)/SE(3) Lie-group operations with Taylor-safe small-angle branches.

Functional counterpart of the reference's `dart/math/Geometry.hpp`
(expMap/expMapRot/expMapJac/so3RightJacobian, `Geometry.hpp:306-361`), written
for JAX: everything is batched-broadcastable, differentiable by AD, and free
of data-dependent control flow.

Conventions (match DART/Featherstone):
  * spatial motion vectors are stacked angular-first: V = (omega; v), shape (..., 6)
  * rotations are 3x3 matrices; exp-map coordinates are (..., 3)
  * a rigid transform T = (R, p) maps child-frame coords to parent-frame:
    x_parent = R @ x_child + p
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Threshold under which Taylor expansions replace trig formulas. This is on
# theta^2; below theta=1e-4 rad the 3-term Taylor series is exact to ~1e-24
# relative, far better than the cancellation-limited trig formulas there.
_SMALL_THETA_SQ = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix. DART `makeSkewSymmetric`."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """(..., 3, 3) skew matrix -> (..., 3) vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _trig_coeffs(theta_sq: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe.

    Uses the double-where trick so gradients through the small-angle branch
    are NaN-free.
    """
    small = theta_sq < _SMALL_THETA_SQ
    # Safe theta that is never 0 in the "exact" branch.
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    A_exact = sin_t / theta
    B_exact = (1.0 - cos_t) / safe_sq
    C_exact = (theta - sin_t) / (safe_sq * theta)
    A_taylor = 1.0 - theta_sq / 6.0 + theta_sq * theta_sq / 120.0
    B_taylor = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    C_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    A = jnp.where(small, A_taylor, A_exact)
    B = jnp.where(small, B_taylor, B_exact)
    C = jnp.where(small, C_taylor, C_exact)
    return A, B, C


def expm_so3(w: jax.Array) -> jax.Array:
    """Rodrigues' formula: exp-map coords (..., 3) -> rotation (..., 3, 3).

    DART `math::expMapRot` (`dart/math/Geometry.hpp`).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _trig_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def logm_so3(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> exp-map coords (..., 3). DART `math::logMap`.

    Safe at theta=0; near theta=pi uses the diagonal-based extraction to stay
    well conditioned.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Branch masks from cos(theta) so they exist before theta does.
    small = cos_t > 1.0 - 1e-12          # theta < ~1.4e-6
    near_pi = cos_t < -1.0 + 1e-8        # theta > ~pi - 1.4e-4
    # arccos'(+-1) = inf: even on branches whose VALUE is discarded by the
    # `where`s below, reverse-mode multiplies a zero cotangent by that inf
    # and produces NaN — so the INPUT must be sanitized, not just the
    # output (0 * inf = NaN is the whole reason this function needs care).
    acos_in = jnp.clip(
        jnp.where(small, jnp.zeros_like(cos_t), cos_t), -1.0 + 1e-12, 1.0
    )
    theta = jnp.where(small, jnp.zeros_like(cos_t), jnp.arccos(acos_in))
    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    sin_t = jnp.sin(theta)
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_t), sin_t)
    antisym = vee(R - jnp.swapaxes(R, -1, -2))
    w_generic = (theta / (2.0 * safe_sin))[..., None] * antisym
    w_small = 0.5 * antisym  # theta -> 0 limit
    # Near pi: R ~ I + 2 B (uu^T - I) with B=(1-cos)/.. ; use diagonal:
    # u_i^2 = (R_ii - cos)/ (1 - cos)
    one_minus_cos = jnp.where(near_pi, 1.0 - cos_t, jnp.ones_like(cos_t))
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    ratio = (diag - cos_t[..., None]) / one_minus_cos[..., None]
    # Same 0*inf hazard: off the near-pi branch route sqrt through 1.0, and
    # on it clamp away sqrt'(0)=inf (axis component exactly in a coordinate
    # plane — subgradient 0 at the |u| kink).
    u_sq = jnp.clip(
        jnp.where(near_pi[..., None], ratio, jnp.ones_like(ratio)), 0.0, 1.0
    )
    # sqrt'(0)=inf needs the clamp, but the clamp must not leak into the
    # VALUE (it floors |u| at 1e-6, visible in round-trip tests): components
    # with u_sq at/below the floor are exactly 0 with subgradient 0.
    u_abs = jnp.where(
        u_sq <= 1e-12,
        jnp.zeros_like(u_sq),
        jnp.sqrt(jnp.maximum(u_sq, 1e-12)),
    )
    # Signs from the antisymmetric part (may be tiny but sign survives),
    # falling back to the off-diagonal symmetric part for the largest axis.
    sign = jnp.where(antisym >= 0.0, 1.0, -1.0)
    w_pi = theta[..., None] * u_abs * sign
    w = jnp.where(small[..., None], w_small, jnp.where(near_pi[..., None], w_pi, w_generic))
    return w


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian Jr of SO(3): exp(w + dw) ≈ exp(w) exp(Jr(w) dw).

    Jr(w) = I - B(θ) ŵ + C(θ) ŵ². Matches DART `math::so3RightJacobian`
    (used by Ball/FreeJoint relative Jacobians and exp-map integration).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _trig_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - B[..., None, None] * W + C[..., None, None] * W2


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian Jl of SO(3): exp(dw) exp(w) ≈ exp(w + Jl(w)^-T ...).

    Jl(w) = Jr(-w) = I + B ŵ + C ŵ²."""
    return so3_right_jacobian(-w)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse of the right Jacobian, Taylor-safe.

    Jr⁻¹(w) = I + ŵ/2 + (1/θ² − (1+cosθ)/(2θ sinθ)) ŵ².
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _SMALL_THETA_SQ
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    coeff_exact = 1.0 / safe_sq - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta))
    coeff_taylor = 1.0 / 12.0 + theta_sq / 720.0
    coeff = jnp.where(small, coeff_taylor, coeff_exact)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coeff[..., None, None] * W2


class Transform(NamedTuple):
    """Rigid transform T = (R, p): x_parent = R @ x_child + p.

    R: (..., 3, 3), p: (..., 3). A NamedTuple so it is automatically a
    pytree and works under vmap/jit/scan.
    """

    R: jax.Array
    p: jax.Array

    @staticmethod
    def identity(dtype=jnp.float32, batch_shape=()) -> "Transform":
        return Transform(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            p=jnp.zeros(batch_shape + (3,), dtype=dtype),
        )

    @staticmethod
    def from_rot_xyz(euler: jax.Array, p: jax.Array) -> "Transform":
        """DART skel-file convention: rotation = eulerXYZToMatrix(rx,ry,rz)."""
        return Transform(R=euler_xyz_to_matrix(euler), p=p)

    def compose(self, other: "Transform") -> "Transform":
        """self ∘ other: first apply `other`, then `self`."""
        return Transform(R=self.R @ other.R, p=_matvec(self.R, other.p) + self.p)

    def inverse(self) -> "Transform":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Transform(R=Rt, p=-_matvec(Rt, self.p))

    def apply(self, x: jax.Array) -> jax.Array:
        """Transform points (..., 3)."""
        return _matvec(self.R, x) + self.p

    def rotate(self, x: jax.Array) -> jax.Array:
        """Rotate vectors (no translation)."""
        return _matvec(self.R, x)

    def homogeneous(self) -> jax.Array:
        """(..., 4, 4) matrix."""
        batch = self.p.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.p.dtype), batch + (1, 4)
        )
        top = jnp.concatenate([self.R, self.p[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def _matvec(M: jax.Array, v: jax.Array) -> jax.Array:
    return jnp.einsum("...ij,...j->...i", M, v)


def euler_xyz_to_matrix(euler: jax.Array) -> jax.Array:
    """R = Rx(a) @ Ry(b) @ Rz(c) — DART `eulerXYZToMatrix` (Geometry.hpp:132).

    This is the convention of skel-file `<transformation>` elements.
    """
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    row0 = jnp.stack([cb * cc, -cb * sc, sb], axis=-1)
    row1 = jnp.stack([ca * sc + cc * sa * sb, ca * cc - sa * sb * sc, -cb * sa], axis=-1)
    row2 = jnp.stack([sa * sc - ca * cc * sb, cc * sa + ca * sb * sc, ca * cb], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_xyz(R: jax.Array) -> jax.Array:
    """Inverse of euler_xyz_to_matrix (principal branch)."""
    b = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    c = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def Ad(T: Transform) -> jax.Array:
    """Adjoint of T as a 6x6 motion transform: V_parent = Ad(T) @ V_child.

    With V = (omega; v): Ad(T) = [[R, 0], [p̂ R, R]].
    """
    R, p = T.R, T.p
    ph_R = hat(p) @ R
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, zero], axis=-1)
    bottom = jnp.concatenate([ph_R, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def Ad_inv(T: Transform) -> jax.Array:
    """Ad(T⁻¹): maps parent-frame motion to child frame."""
    return Ad(T.inverse())


def ad(V: jax.Array) -> jax.Array:
    """Spatial cross-product (motion x motion) matrix: ad(V) @ W = V ×ₘ W.

    With V = (w; v): ad(V) = [[ŵ, 0], [v̂, ŵ]].
    """
    w, v = V[..., :3], V[..., 3:]
    wh, vh = hat(w), hat(v)
    zero = jnp.zeros_like(wh)
    top = jnp.concatenate([wh, zero], axis=-1)
    bottom = jnp.concatenate([vh, wh], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad_motion(V: jax.Array, W: jax.Array) -> jax.Array:
    """V ×ₘ W without building the 6x6 (vector form)."""
    w, v = V[..., :3], V[..., 3:]
    ww, wv = W[..., :3], W[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, ww), jnp.cross(v, ww) + jnp.cross(w, wv)], axis=-1
    )


def ad_dual(V: jax.Array, F: jax.Array) -> jax.Array:
    """V ×f F = -ad(V)ᵀ F (dual / force cross product). DART `dad`."""
    w, v = V[..., :3], V[..., 3:]
    n, f = F[..., :3], F[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(v, f), jnp.cross(w, f)], axis=-1
    )


def Ad_apply(T: Transform, V: jax.Array) -> jax.Array:
    """Ad(T) @ V in vector form: (Rw; p̂Rw + Rv)."""
    w, v = V[..., :3], V[..., 3:]
    Rw = T.rotate(w)
    return jnp.concatenate([Rw, jnp.cross(T.p, Rw) + T.rotate(v)], axis=-1)


def Ad_inv_apply(T: Transform, V: jax.Array) -> jax.Array:
    """Ad(T⁻¹) @ V = (Rᵀw; Rᵀ(v − p̂ w))."""
    w, v = V[..., :3], V[..., 3:]
    Rt = jnp.swapaxes(T.R, -1, -2)
    return jnp.concatenate(
        [_matvec(Rt, w), _matvec(Rt, v - jnp.cross(T.p, w))], axis=-1
    )


def Ad_dual_apply(T: Transform, F: jax.Array) -> jax.Array:
    """dAd(T⁻¹) F: force child→parent = Ad(T⁻¹)ᵀ F = (Rn + p̂Rf; Rf)."""
    n, f = F[..., :3], F[..., 3:]
    Rf = T.rotate(f)
    return jnp.concatenate([T.rotate(n) + jnp.cross(T.p, Rf), Rf], axis=-1)


def Ad_inv_dual_apply(T: Transform, F: jax.Array) -> jax.Array:
    """dAd(T) F: force parent→child = Ad(T)ᵀ F = (Rᵀ(n − p̂f); Rᵀf)."""
    n, f = F[..., :3], F[..., 3:]
    Rt = jnp.swapaxes(T.R, -1, -2)
    return jnp.concatenate(
        [_matvec(Rt, n - jnp.cross(T.p, f)), _matvec(Rt, f)], axis=-1
    )


def se3_exp(xi: jax.Array) -> Transform:
    """SE(3) exponential of a twist xi = (w; v): Transform (exp(ŵ), Jl(w) v)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = expm_so3(w)
    p = _matvec(so3_left_jacobian(w), v)
    return Transform(R=R, p=p)


def se3_log(T: Transform) -> jax.Array:
    """Inverse of se3_exp."""
    w = logm_so3(T.R)
    # Jl(w) = Jr(-w), so Jl⁻¹(w) = Jr⁻¹(-w).
    Jl_inv = so3_right_jacobian_inv(-w)
    v = _matvec(Jl_inv, T.p)
    return jnp.concatenate([w, v], axis=-1)

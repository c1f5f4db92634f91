"""Lie-group math vs finite differences and algebraic identities.

Mirrors the reference's Geometry tests (`unittests/unit/test_Math.cpp`,
`math/Geometry.hpp:306-361` expMap/expMapJac)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.ops import lie
from nimblephysics_tpu.utils.fd import fd_jacobian

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("scale", [1e-9, 1e-5, 0.1, 1.0, 3.0])
def test_expm_orthonormal(scale):
    w = RNG.standard_normal(3) * scale
    R = np.asarray(lie.expm_so3(jnp.asarray(w)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-11)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-11)


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.5, 2.0, 3.1])
def test_log_exp_roundtrip(scale):
    w = RNG.standard_normal(3)
    w = w / np.linalg.norm(w) * scale
    w2 = np.asarray(lie.logm_so3(lie.expm_so3(jnp.asarray(w))))
    np.testing.assert_allclose(w2, w, atol=1e-7)


def test_logm_near_pi():
    w = np.asarray([0.0, 0.0, np.pi - 1e-9])
    R = lie.expm_so3(jnp.asarray(w))
    w2 = np.asarray(lie.logm_so3(R))
    np.testing.assert_allclose(np.abs(w2), np.abs(w), atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 0.3, 2.0])
def test_right_jacobian_fd(scale):
    """exp(w + dw) ≈ exp(w) exp(Jr dw): check Jr against FD of the log."""
    w = RNG.standard_normal(3) * scale

    def f(dw):
        # log(exp(w)^-1 exp(w+dw)) = Jr(w) dw + O(dw^2)
        R = lie.expm_so3(jnp.asarray(w + dw))
        Rw = np.asarray(lie.expm_so3(jnp.asarray(w)))
        return np.asarray(lie.logm_so3(jnp.asarray(Rw.T) @ R))

    J_fd = fd_jacobian(f, np.zeros(3), eps=1e-7)
    Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
    np.testing.assert_allclose(Jr, J_fd, atol=1e-6)


def test_right_jacobian_inverse():
    w = RNG.standard_normal(3)
    Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
    Jr_inv = np.asarray(lie.so3_right_jacobian_inv(jnp.asarray(w)))
    np.testing.assert_allclose(Jr @ Jr_inv, np.eye(3), atol=1e-10)


def test_adjoint_identity():
    """Ad(T) as a matrix vs vector-form application, and Ad(T1 T2) = Ad(T1)Ad(T2)."""
    def rand_T():
        return lie.Transform(
            lie.expm_so3(jnp.asarray(RNG.standard_normal(3))),
            jnp.asarray(RNG.standard_normal(3)),
        )

    T1, T2 = rand_T(), rand_T()
    V = jnp.asarray(RNG.standard_normal(6))
    np.testing.assert_allclose(
        np.asarray(lie.Ad(T1) @ V), np.asarray(lie.Ad_apply(T1, V)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lie.Ad(T1.compose(T2))),
        np.asarray(lie.Ad(T1) @ lie.Ad(T2)),
        atol=1e-12,
    )
    # inverse
    np.testing.assert_allclose(
        np.asarray(lie.Ad_inv(T1)), np.linalg.inv(np.asarray(lie.Ad(T1))), atol=1e-10
    )
    # dual application = transpose
    F = jnp.asarray(RNG.standard_normal(6))
    np.testing.assert_allclose(
        np.asarray(lie.Ad_dual_apply(T1, F)),
        np.linalg.inv(np.asarray(lie.Ad(T1))).T @ np.asarray(F),
        atol=1e-10,
    )


def test_ad_bracket():
    """ad(V)W = d/dt Ad(exp(tV))W at t=0."""
    V = RNG.standard_normal(6)
    W = jnp.asarray(RNG.standard_normal(6))

    def f(t):
        T = lie.se3_exp(jnp.asarray(V * t[0]))
        return np.asarray(lie.Ad_apply(T, W))

    J_fd = fd_jacobian(f, np.zeros(1), eps=1e-6)[:, 0]
    np.testing.assert_allclose(
        np.asarray(lie.ad_motion(jnp.asarray(V), W)), J_fd, atol=1e-6
    )


def test_se3_exp_log_roundtrip():
    xi = RNG.standard_normal(6)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-8)


def test_euler_xyz_matches_single_axis():
    a = 0.37
    np.testing.assert_allclose(
        np.asarray(lie.euler_xyz_to_matrix(jnp.asarray([a, 0.0, 0.0]))),
        np.asarray(lie.expm_so3(jnp.asarray([a, 0.0, 0.0]))),
        atol=1e-12,
    )
    e = RNG.standard_normal(3) * 0.4
    R = lie.euler_xyz_to_matrix(jnp.asarray(e))
    np.testing.assert_allclose(
        np.asarray(lie.matrix_to_euler_xyz(R)), e, atol=1e-10
    )


def test_grad_through_expm_at_zero():
    """AD through the Taylor-safe branch must be NaN-free at w=0."""
    g = jax.grad(lambda w: jnp.sum(lie.expm_so3(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda w: jnp.sum(lie.so3_right_jacobian(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_logm_so3_reverse_grads_finite_everywhere():
    """Regression: reverse-mode through logm_so3 at identity produced NaN
    (0 * inf via arccos'(1)/sqrt'(0) on masked branches). Identity rotation
    is the DEFAULT free-joint state, so every rollout gradient hit it."""
    import jax

    from nimblephysics_tpu.ops import lie

    for w0 in ([0.0, 0.0, 0.0], [1e-9, 0.0, 0.0], [0.3, -0.2, 0.5],
               [np.pi - 1e-3, 0.0, 0.0], [0.0, np.pi - 5e-5, 0.0]):
        w0 = jnp.asarray(w0, dtype=jnp.float64)
        J = jax.jacrev(lambda w: lie.logm_so3(lie.expm_so3(w)))(w0)
        assert np.isfinite(np.asarray(J)).all(), w0
        # round-trip and consistency with forward mode where defined
        assert np.allclose(
            np.asarray(lie.logm_so3(lie.expm_so3(w0))), np.asarray(w0),
            atol=1e-6)
        Jf = jax.jacfwd(lambda w: lie.logm_so3(lie.expm_so3(w)))(w0)
        assert np.allclose(np.asarray(J), np.asarray(Jf), atol=1e-5), w0

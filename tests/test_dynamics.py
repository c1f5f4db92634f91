"""Articulated dynamics vs finite differences and classical mechanics.

The reference validates every dynamics quantity against FD twins
(`unittests/GradientTestUtils.hpp`, `test_SimpleFeatherstone.cpp`); here we
additionally pin simple systems to closed-form answers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import build_model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops import lie
from nimblephysics_tpu.utils.fd import fd_jacobian

RNG = np.random.default_rng(42)


def _random_model():
    """A deliberately gnarly chain: free + revolute + ball + prismatic +
    universal + translational2d + weld, with offsets and rotated frames."""
    def rt(scale=1.0):
        return lie.Transform(
            np.asarray(lie.expm_so3(jnp.asarray(RNG.standard_normal(3) * 0.3))),
            RNG.standard_normal(3) * scale,
        )

    joints = [
        dict(type="free", name="root", body_name="b0", parent=-1,
             T_pj=rt(0.2), T_cj=rt(0.1), mass=2.0,
             com=RNG.standard_normal(3) * 0.1,
             moment=np.diag([0.3, 0.25, 0.2])),
        dict(type="revolute", name="r1", body_name="b1", parent=0,
             T_pj=rt(0.3), T_cj=rt(0.1),
             axes=[_unit()], mass=1.5, com=RNG.standard_normal(3) * 0.1,
             moment=np.diag([0.12, 0.1, 0.08]), damping=0.2, stiffness=0.5),
        dict(type="ball", name="b2j", body_name="b2", parent=1,
             T_pj=rt(0.3), T_cj=rt(0.1), mass=0.8,
             com=RNG.standard_normal(3) * 0.05,
             moment=np.diag([0.05, 0.06, 0.07])),
        dict(type="prismatic", name="p3", body_name="b3", parent=2,
             T_pj=rt(0.2), axes=[_unit()], mass=1.1,
             moment=np.diag([0.1, 0.1, 0.1]), damping=0.1),
        dict(type="universal", name="u4", body_name="b4", parent=1,
             T_pj=rt(0.25), T_cj=rt(0.05), axes=[_unit(), _unit()],
             mass=0.6, moment=np.diag([0.04, 0.05, 0.03])),
        dict(type="translational2d", name="t5", body_name="b5", parent=4,
             axes=[_unit(), _unit()], mass=0.9, moment=np.eye(3) * 0.02),
        dict(type="weld", name="w6", body_name="b6", parent=5,
             T_pj=rt(0.15), mass=0.4, com=[0.1, 0.0, 0.0],
             moment=np.eye(3) * 0.01),
    ]
    return build_model(joints, dt=0.005)


def _unit():
    v = RNG.standard_normal(3)
    return v / np.linalg.norm(v)


MODEL = _random_model()
NQ = MODEL.nq
Q0 = RNG.standard_normal(NQ) * 0.4
V0 = RNG.standard_normal(NQ) * 0.7
TAU0 = RNG.standard_normal(NQ)


def test_mass_matrix_symmetric_posdef():
    M = np.asarray(dyn.mass_matrix(MODEL, jnp.asarray(Q0)))
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    eig = np.linalg.eigvalsh(M)
    assert eig.min() > 0


def test_aba_matches_crba_rnea():
    """ABA q̈ must equal M⁻¹(tau_eff − C(q,v)): two independent algorithms."""
    q, v, tau = jnp.asarray(Q0), jnp.asarray(V0), jnp.asarray(TAU0)
    qdd_aba = np.asarray(dyn.aba(MODEL, q, v, tau))
    M = np.asarray(dyn.mass_matrix(MODEL, q))
    C = np.asarray(dyn.coriolis_and_gravity(MODEL, q, v))
    tau_eff = np.asarray(dyn.joint_forces(MODEL, q, v, tau))
    qdd_ref = np.linalg.solve(M, tau_eff - C)
    np.testing.assert_allclose(qdd_aba, qdd_ref, atol=1e-8)


def test_rnea_aba_roundtrip():
    """rnea(q, v, aba(q, v, tau)) == tau_eff (inverse of forward)."""
    q, v, tau = jnp.asarray(Q0), jnp.asarray(V0), jnp.asarray(TAU0)
    qdd = dyn.aba(MODEL, q, v, tau)
    tau_rt = np.asarray(dyn.rnea(MODEL, q, v, qdd))
    tau_eff = np.asarray(dyn.joint_forces(MODEL, q, v, tau))
    np.testing.assert_allclose(tau_rt, tau_eff, atol=1e-8)


def test_velocity_kinematics_fd():
    """Body spatial velocity == d/dt of FK along (q, q̇): checks S and Ad chain."""
    q, v = jnp.asarray(Q0), jnp.asarray(V0)
    kin = dyn.forward_kinematics(MODEL, q)
    vel = dyn.velocity_kinematics(MODEL, kin, q, v)
    for b in [0, 2, 3, 6]:
        def pose(qq, b=b):
            k = dyn.forward_kinematics(MODEL, jnp.asarray(qq))
            return np.concatenate(
                [np.asarray(k.T_wb[b].R).ravel(), np.asarray(k.T_wb[b].p)]
            )

        Jq = fd_jacobian(pose, np.asarray(Q0), eps=1e-7)
        dpose = Jq @ np.asarray(V0)
        dR = dpose[:9].reshape(3, 3)
        dp = dpose[9:]
        R = np.asarray(kin.T_wb[b].R)
        w_body = np.asarray(lie.vee(jnp.asarray(R.T @ dR)))
        v_body = R.T @ dp
        V_expect = np.concatenate([w_body, v_body])
        np.testing.assert_allclose(
            np.asarray(vel.V[b]), V_expect, atol=1e-6,
            err_msg=f"body {b} spatial velocity",
        )


def test_gravity_only_pendulum_analytic():
    """Single pendulum: q̈ = −(g/L)·sin(q) for point mass at distance L."""
    m = builders.pendulum(1)
    q = jnp.asarray([0.3])
    qdd = np.asarray(dyn.aba(m, q, jnp.zeros(1), jnp.zeros(1)))
    # point mass at L=1 below joint, gravity -9.81 y: q̈ = -(g/L) sin(q)
    np.testing.assert_allclose(qdd[0], -9.81 * np.sin(0.3), rtol=1e-6)


def test_energy_conservation_double_pendulum():
    """Undamped double pendulum with small RK4 steps conserves energy."""
    m = builders.pendulum(2, dt=1e-4)
    q = jnp.asarray([0.7, -0.3])
    v = jnp.asarray([0.0, 0.0])

    def energy(q, v):
        M = dyn.mass_matrix(m, q)
        kin = dyn.forward_kinematics(m, q)
        pe = 0.0
        for i in range(m.num_bodies):
            com_w = kin.T_wb[i].apply(m.com[i])
            pe = pe + m.mass[i] * 9.81 * com_w[1]
        return 0.5 * v @ M @ v + pe

    def deriv(state):
        q, v = state[:2], state[2:]
        return jnp.concatenate([v, dyn.aba(m, q, v, jnp.zeros(2))])

    @jax.jit
    def rk4_steps(x):
        def body(x, _):
            h = 1e-4
            k1 = deriv(x)
            k2 = deriv(x + 0.5 * h * k1)
            k3 = deriv(x + 0.5 * h * k2)
            k4 = deriv(x + h * k3)
            return x + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4), None
        return jax.lax.scan(body, x, None, length=200)[0]

    x0 = jnp.concatenate([q, v])
    e0 = float(energy(q, v))
    xT = rk4_steps(x0)
    eT = float(energy(xT[:2], xT[2:]))
    assert abs(eT - e0) < 1e-6 * max(1.0, abs(e0))


def test_aba_jit_and_grad():
    """jit compiles; AD through ABA is finite and matches FD on a loss."""
    q, v, tau = jnp.asarray(Q0), jnp.asarray(V0), jnp.asarray(TAU0)
    f = jax.jit(lambda q, v, tau: jnp.sum(dyn.aba(MODEL, q, v, tau) ** 2))
    g = jax.grad(f, argnums=(0, 1, 2))(q, v, tau)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
    g_fd = fd_jacobian(
        lambda qq: np.asarray([float(f(jnp.asarray(qq), v, tau))]),
        np.asarray(Q0), eps=1e-6,
    )[0]
    np.testing.assert_allclose(np.asarray(g[0]), g_fd, rtol=2e-4, atol=1e-5)


def test_mass_matrix_grad_wrt_mass():
    """System-ID axis: d(M)/d(mass) via AD vs FD (the reference's
    WithRespectTo::GROUP_MASSES analog is free here)."""
    q = jnp.asarray(Q0)

    def f(masses):
        m2 = MODEL.replace(mass=jnp.asarray(masses))
        return np.asarray(dyn.mass_matrix(m2, q)).ravel()

    J_fd = fd_jacobian(f, np.asarray(MODEL.mass), eps=1e-6)
    J_ad = jax.jacfwd(
        lambda masses: dyn.mass_matrix(MODEL.replace(mass=masses), q).ravel()
    )(MODEL.mass)
    np.testing.assert_allclose(np.asarray(J_ad), J_fd, atol=1e-6)


def test_point_jacobian_fd():
    q = jnp.asarray(Q0)
    kin = dyn.forward_kinematics(MODEL, q)
    b = 3
    p_local = jnp.asarray([0.05, -0.02, 0.1])
    p_w = kin.T_wb[b].apply(p_local)
    Jp = np.asarray(dyn.point_jacobian(MODEL, kin, b, p_w))

    def point(qq):
        k = dyn.forward_kinematics(MODEL, jnp.asarray(qq))
        return np.asarray(k.T_wb[b].apply(p_local))

    J_fd = fd_jacobian(point, np.asarray(Q0), eps=1e-7)
    np.testing.assert_allclose(Jp, J_fd, atol=1e-6)


def test_domain_randomization_over_model_params():
    """vmap over MODEL parameters (masses + gravity) — the reference's
    WithRespectTo axes as batch axes for domain randomization."""
    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.models.model import State
    from nimblephysics_tpu.simulation.step import rollout

    model = builders.pendulum(2, dt=0.01)
    B = 8
    rng = np.random.default_rng(0)
    masses = jnp.asarray(1.0 + 0.5 * rng.random((B, 2)))

    def final_q(mass):
        m2 = model.replace(mass=mass)
        final, _ = rollout(
            m2, State(jnp.asarray([0.5, -0.2]), jnp.zeros(2)),
            jnp.zeros((50, 2)),
        )
        return final.q

    qs = jax.jit(jax.vmap(final_q))(masses)
    assert qs.shape == (B, 2)
    assert np.all(np.isfinite(np.asarray(qs)))
    # different masses -> different trajectories
    assert np.std(np.asarray(qs)[:, 1]) > 1e-4

    # gradient of a batched loss wrt all masses at once
    g = jax.grad(lambda ms: jnp.sum(jax.vmap(final_q)(ms) ** 2))(masses)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 1e-6


# ---------------------------------------------------------------------------
# Biomechanics joints (EllipsoidJoint / ScapulathoracicJoint / ConstantCurve)
# ---------------------------------------------------------------------------

def _biomech_chain():
    """Chain exercising all four OpenSim biomech joint types."""
    joints = [
        dict(type="ellipsoid", name="ej", body_name="bb0", parent=-1,
             axes=[[0.07, 0.05, 0.09], [0, 0, 0]],
             custom_spec=("xyz", (1.0, 1.0, 1.0)),
             mass=1.2, moment=np.diag([0.02, 0.03, 0.025])),
        dict(type="scapulathoracic", name="sj", body_name="bb1", parent=0,
             axes=[[0.08, 0.06, 0.1], [0.01, -0.02, 0.3]],
             custom_spec=("xyz", (1.0, 1.0, 1.0, 1.0)),
             mass=0.7, com=[0.02, 0.01, 0.0], moment=np.eye(3) * 0.01),
        dict(type="constant_curve", name="cj", body_name="bb2", parent=1,
             axes=[[0.01, -0.02, 0.03], [0.2, 1.0, 0.0]],
             custom_spec=((1.0, 1.0, 1.0),),
             mass=0.9, moment=np.eye(3) * 0.015),
        dict(type="constant_curve_incompressible", name="ci", body_name="bb3",
             parent=2, axes=[[0.02, 0.01, -0.01], [0.25, 1.0, 0.0]],
             custom_spec=((1.0, 1.0, 1.0),),
             mass=0.5, moment=np.eye(3) * 0.008),
    ]
    return build_model(joints, dt=0.002)


def test_biomech_joint_subspaces_match_fd():
    """S columns must equal (vee(Rᵀ∂R/∂qj); Rᵀ∂p/∂qj) by FD — the reference
    hand-derives these (EllipsoidJoint.cpp:199+, ScapulathoracicJoint.cpp:202+,
    ConstantCurveJoint.cpp:154+); we AD them, FD is the impartial judge."""
    from nimblephysics_tpu.ops import joints as J

    cases = [
        ("ellipsoid", 3, np.asarray([[0.07, 0.05, 0.09], [0, 0, 0], [0, 0, 0]]),
         ("xyz", (1.0, 1.0, 1.0))),
        ("scapulathoracic", 4,
         np.asarray([[0.08, 0.06, 0.1], [0.01, -0.02, 0.3], [0, 0, 0]]),
         ("xyz", (1.0, -1.0, 1.0, 1.0))),
        ("constant_curve", 4,
         np.asarray([[0.01, -0.02, 0.03], [0.2, 1.0, 0.0], [0, 0, 0]]),
         ((1.0, 1.0, 1.0),)),
        ("constant_curve_incompressible", 3,
         np.asarray([[0.02, 0.01, -0.01], [0.25, 1.0, 0.0], [0, 0, 0]]),
         ((1.0, 1.0, 1.0),)),
    ]
    for jtype, nd, axes, spec in cases:
        q = RNG.standard_normal(nd) * 0.4
        axes_j = jnp.asarray(axes)

        def tf(qq):
            T = J.joint_transform(jtype, jnp.asarray(qq), axes_j, spec)
            return np.concatenate([np.asarray(T.R).ravel(), np.asarray(T.p)])

        S = np.asarray(J.joint_subspace(jtype, jnp.asarray(q), axes_j, spec))
        fd = fd_jacobian(tf, q, eps=1e-6)
        T0 = J.joint_transform(jtype, jnp.asarray(q), axes_j, spec)
        R0 = np.asarray(T0.R)
        for j in range(nd):
            dR = fd[:9, j].reshape(3, 3)
            dp = fd[9:, j]
            w = np.asarray(lie.vee(jnp.asarray(R0.T @ dR)))
            np.testing.assert_allclose(S[:3, j], w, atol=2e-4, err_msg=jtype)
            np.testing.assert_allclose(S[3:, j], R0.T @ dp, atol=2e-4,
                                       err_msg=jtype)


def test_biomech_joint_transform_geometry():
    """Pin the transforms to their geometric definitions."""
    from nimblephysics_tpu.ops import joints as J

    radii = jnp.asarray([0.07, 0.05, 0.09])
    axes = jnp.zeros((3, 3)).at[0].set(radii)
    q = jnp.asarray([0.3, -0.2, 0.4])
    T = J.joint_transform("ellipsoid", q, axes, ("xyz", (1.0, 1.0, 1.0)))
    # translation lies ON the ellipsoid surface
    assert abs(float(jnp.sum((T.p / radii) ** 2)) - 1.0) < 1e-5
    # scapulathoracic with zero winging == ellipsoid
    axes_s = axes.at[1].set(jnp.asarray([0.01, -0.02, 0.3]))
    Ts = J.joint_transform("scapulathoracic", jnp.concatenate([q, jnp.zeros(1)]),
                           axes_s, ("xyz", (1.0, 1.0, 1.0, 1.0)))
    np.testing.assert_allclose(np.asarray(Ts.R), np.asarray(T.R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Ts.p), np.asarray(T.p), atol=1e-6)
    # constant curve at zero angles: straight rod of length d along +Y
    axes_c = jnp.zeros((3, 3)).at[1].set(jnp.asarray([0.0, 1.0, 0.0]))
    Tc = J.joint_transform("constant_curve", jnp.asarray([0.0, 0.0, 0.0, 0.3]),
                           axes_c, ((1.0, 1.0, 1.0),))
    np.testing.assert_allclose(np.asarray(Tc.p), [0.0, 0.3, 0.0], atol=1e-5)
    # bent rod: arc length preserved would mean |p| < d, p_y > 0
    Tb = J.joint_transform("constant_curve", jnp.asarray([0.5, 0.2, 0.0, 0.3]),
                           axes_c, ((1.0, 1.0, 1.0),))
    assert float(jnp.linalg.norm(Tb.p)) < 0.3
    assert float(Tb.p[1]) > 0.0


def test_biomech_chain_dynamics_consistency():
    """ABA == M⁻¹(τ − C) and the step is differentiable through the whole
    biomech-joint chain."""
    from nimblephysics_tpu.models.model import State
    from nimblephysics_tpu.simulation.step import step

    model = _biomech_chain()
    nq = model.nq
    assert nq == 3 + 4 + 4 + 3
    q = jnp.asarray(RNG.standard_normal(nq) * 0.3)
    v = jnp.asarray(RNG.standard_normal(nq) * 0.5)
    tau = jnp.asarray(RNG.standard_normal(nq))

    a_aba = dyn.aba(model, q, v, tau)
    M = dyn.mass_matrix(model, q)
    C = dyn.coriolis_and_gravity(model, q, v)
    a_ref = jnp.linalg.solve(M, tau - C)
    np.testing.assert_allclose(np.asarray(a_aba), np.asarray(a_ref),
                               rtol=2e-3, atol=2e-4)
    # M is SPD
    w = np.linalg.eigvalsh(np.asarray(M))
    assert w.min() > 0

    # differentiable step (grad wrt q of a rollout-ish loss is finite)
    def loss(q0):
        s = step(model, State(q0, v), tau)
        return jnp.sum(s.q ** 2) + jnp.sum(s.v ** 2)

    g = jax.grad(loss)(q)
    assert np.all(np.isfinite(np.asarray(g)))

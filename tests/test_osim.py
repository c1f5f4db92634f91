"""OpenSim model loading (CustomJoint splines) + custom joint dynamics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models.model import State, build_model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.functions import build_spline_spec
from nimblephysics_tpu.ops.lie import Transform
from nimblephysics_tpu.utils.fd import fd_jacobian

OSIM = "/root/reference/data/osim/LaiArnoldSubject6/LaiArnold2017_refined.osim"


def test_custom_joint_dynamics_consistent():
    """A 1-dof custom joint (spline-coupled knee-style): ABA == CRBA/RNEA
    and velocity kinematics match FD."""
    spline = build_spline_spec([-2.0, -1.0, 0.0, 1.0, 2.0],
                               [0.02, 0.01, 0.0, -0.015, -0.03])
    spec = (
        1,
        (
            ("rot", (0.0, 0.0, 1.0), ("linear", 1.0, 0.0), 0),
            ("rot", (1.0, 0.0, 0.0), ("constant", 0.0), -1),
            ("rot", (0.0, 1.0, 0.0), ("constant", 0.0), -1),
            ("trans", (1.0, 0.0, 0.0), spline, 0),
            ("trans", (0.0, 1.0, 0.0), ("linear", 0.05, 0.0), 0),
            ("trans", (0.0, 0.0, 1.0), ("constant", 0.0), -1),
        ),
    )
    joints = [
        dict(type="revolute", name="hip", body_name="thigh", parent=-1,
             axes=[[0.0, 0.0, 1.0]], mass=5.0, com=[0.0, -0.2, 0.0],
             moment=np.eye(3) * 0.1),
        dict(type="custom", name="knee", body_name="shank", parent=0,
             T_pj=Transform(np.eye(3), np.asarray([0.0, -0.4, 0.0])),
             custom_spec=spec, mass=3.0, com=[0.0, -0.18, 0.0],
             moment=np.eye(3) * 0.05),
    ]
    model = build_model(joints, dt=0.002)
    assert model.nq == 2

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, 2))
    v = jnp.asarray(rng.standard_normal(2))
    tau = jnp.asarray(rng.standard_normal(2))

    qdd = np.asarray(dyn.aba(model, q, v, tau))
    M = np.asarray(dyn.mass_matrix(model, q))
    C = np.asarray(dyn.coriolis_and_gravity(model, q, v))
    qdd_ref = np.linalg.solve(M, np.asarray(tau) - C)
    np.testing.assert_allclose(qdd, qdd_ref, atol=1e-8)

    # FK velocity of the shank matches FD along (q, v)
    kin = dyn.forward_kinematics(model, q)
    vel = dyn.velocity_kinematics(model, kin, q, v)

    def pose(qq):
        k = dyn.forward_kinematics(model, jnp.asarray(qq))
        return np.concatenate(
            [np.asarray(k.T_wb[1].R).ravel(), np.asarray(k.T_wb[1].p)]
        )

    Jq = fd_jacobian(pose, np.asarray(q), eps=1e-7)
    dpose = Jq @ np.asarray(v)
    R = np.asarray(kin.T_wb[1].R)
    from nimblephysics_tpu.ops import lie

    w_body = np.asarray(lie.vee(jnp.asarray(R.T @ dpose[:9].reshape(3, 3))))
    v_body = R.T @ dpose[9:]
    np.testing.assert_allclose(
        np.asarray(vel.V[1]), np.concatenate([w_body, v_body]), atol=1e-6
    )


def _check_human_model(model, s0, markers, min_markers):
    from nimblephysics_tpu.biomechanics.markers import marker_world_positions

    assert model.num_bodies >= 10
    assert "custom" in model.joint_types
    assert model.nq >= 20
    assert len(markers.names) >= min_markers

    # mass matrix and gravity forces are finite at the default pose
    M = dyn.mass_matrix(model, s0.q)
    assert np.all(np.isfinite(np.asarray(M)))
    eig = np.linalg.eigvalsh(np.asarray(M))
    assert eig.min() > 0, eig.min()
    C = dyn.coriolis_and_gravity(model, s0.q, jnp.zeros(model.nq))
    assert np.all(np.isfinite(np.asarray(C)))

    # markers land within a human-sized bounding box
    if len(markers.names):
        pts = np.asarray(marker_world_positions(model, markers, s0.q))
        assert np.all(np.isfinite(pts))
        assert np.ptp(pts, axis=0).max() < 3.0

    # ABA runs and is finite (full biomech skeleton dynamics)
    qdd = dyn.aba(model, s0.q, jnp.zeros(model.nq), jnp.zeros(model.nq))
    assert np.all(np.isfinite(np.asarray(qdd)))


@pytest.mark.skipif(not os.path.exists(OSIM), reason="no reference data")
def test_parse_osim_v3():
    from nimblephysics_tpu.utils.osim_parser import parse_osim

    model, s0, markers = parse_osim(OSIM)
    _check_human_model(model, s0, markers, min_markers=0)
    # a marker-bearing v3 model
    fbls = "/root/reference/data/osim/FBLSmodel.osim"
    if os.path.exists(fbls):
        m2, s2, mk2 = parse_osim(fbls)
        assert len(mk2.names) > 50


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/osim/welk002/unscaled_generic.osim"),
    reason="no reference data",
)
def test_parse_osim_v4():
    from nimblephysics_tpu.utils.osim_parser import parse_osim

    model, s0, markers = parse_osim(
        "/root/reference/data/osim/welk002/unscaled_generic.osim"
    )
    _check_human_model(model, s0, markers, min_markers=50)


def test_scapula_model_loads_and_simulates():
    from nimblephysics_tpu.utils.osim_parser import parse_osim

    """ScapulothoracicJoint (v3 file): the shoulder model loads with the
    4-dof scapulathoracic joint and its dynamics are consistent."""
    path = "/root/reference/data/osim/ScapulaModel/ScapulothoracicJoint_Shoulder.osim"
    if not os.path.exists(path):
        pytest.skip("scapula model not present")
    model, state, _ = parse_osim(path)
    assert "scapulathoracic" in model.joint_types
    nq = model.nq
    M = dyn.mass_matrix(model, state.q)
    assert np.linalg.eigvalsh(np.asarray(M)).min() > 0
    a = dyn.aba(model, state.q, state.v, jnp.zeros(nq))
    assert np.all(np.isfinite(np.asarray(a)))


def test_complete_human_model_loads():
    from nimblephysics_tpu.utils.osim_parser import parse_osim

    """CompleteHumanModel (v4): EllipsoidJoint + ConstantCurvatureJoint
    (spine) + CustomJoints all in one skeleton."""
    path = ("/root/reference/data/osim/CompleteHumanModel/"
            "CompleteHumanModel.osim")
    if not os.path.exists(path):
        pytest.skip("complete human model not present")
    model, state, _ = parse_osim(path)
    assert "ellipsoid" in model.joint_types
    assert "constant_curve_incompressible" in model.joint_types
    a = dyn.aba(model, state.q, state.v, jnp.zeros(model.nq))
    assert np.all(np.isfinite(np.asarray(a)))

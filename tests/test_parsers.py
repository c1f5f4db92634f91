"""Parse the reference's benchmark .skel scenes and simulate them.

Fixtures are the REAL reference data files (read-only mount), exactly as
`unittests/comprehensive/test_HalfCheetahRealtime.cpp` etc. load them."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.simulation.step import rollout
from nimblephysics_tpu.utils.skel_parser import parse_skel

SKEL_DIR = "/root/reference/data/skel"

needs_data = pytest.mark.skipif(
    not os.path.isdir(SKEL_DIR), reason="reference data not mounted"
)


@needs_data
def test_parse_inverted_double_pendulum():
    model, s0 = parse_skel(f"{SKEL_DIR}/inverted_double_pendulum.skel")
    assert model.nq == 3
    assert model.joint_types == ("prismatic", "revolute", "revolute", "weld")
    assert float(model.dt) == 0.01
    np.testing.assert_allclose(np.asarray(model.gravity), [0, -9.81, 0])
    # damping on the two revolute poles
    np.testing.assert_allclose(np.asarray(model.damping), [0.0, 0.1, 0.1])
    M = dyn.mass_matrix(model, s0.q)
    assert np.all(np.isfinite(np.asarray(M)))
    # total mass: 0.75 + 0.025 + 0.025 + 0.3
    np.testing.assert_allclose(float(jnp.sum(model.mass)), 1.1)


@needs_data
def test_parse_cartpole():
    model, s0 = parse_skel(f"{SKEL_DIR}/cartpole.skel")
    # immobile "rail" skeleton becomes static geometry, not dofs
    assert model.nq == 2
    np.testing.assert_allclose(np.asarray(model.damping), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(model.q_lower), [-1.0, -1.57])
    # pole mass/inertia from capsule shape (reference quirk: unrotated)
    assert abs(float(model.mass[1]) - 4.8953899) < 1e-6


@needs_data
def test_parse_half_cheetah_and_simulate():
    model, s0 = parse_skel(f"{SKEL_DIR}/half_cheetah.skel")
    # 2 prismatic + 1 revolute root + 6 leg joints + welds for head
    assert model.nq == 9
    assert "halfspace" in {s.kind for s in model.shapes}  # ground plane
    ncap = sum(1 for s in model.shapes if s.kind == "capsule")
    assert ncap >= 7  # pelvis + head? + 6 leg segments

    # Drop the cheetah: it must land on the ground and come to rest without
    # falling through (pelvis starts at y=0.7 in the file's frame... init
    # q are zeros; root y dof is relative).
    T = 600
    final, traj = jax.jit(
        lambda: rollout(model, s0, jnp.zeros((T, model.num_actions)))
    )()
    ys = np.asarray(traj.q[:, 1])
    assert np.all(np.isfinite(ys))
    assert ys[-1] > -0.8, ys[-1]       # did not fall through the ground
    assert abs(float(final.v[1])) < 0.5  # roughly settled vertically


@needs_data
def test_half_cheetah_gradients_finite():
    model, s0 = parse_skel(f"{SKEL_DIR}/half_cheetah.skel")

    def loss(u):
        final, _ = rollout(model, s0, u)
        return final.q[0]  # forward progress

    g = jax.jit(jax.grad(loss))(jnp.zeros((50, model.num_actions)))
    assert np.all(np.isfinite(np.asarray(g)))


@needs_data
def test_vsk_parser():
    from nimblephysics_tpu.utils.vsk_parser import parse_vsk

    f = parse_vsk("/root/reference/data/vsk/Nick01.vsk")
    assert len(f.markers) > 10
    assert f.parameters.get("HipWidth", 0) > 0
    # marker offsets resolved from parameters, mm -> m
    lfwt = [m for m in f.markers if m.name == "LFWT"]
    assert lfwt, [m.name for m in f.markers[:5]]
    assert 0.01 < np.linalg.norm(lfwt[0].position) < 1.0


def test_mjcf_exporter_well_formed():
    import xml.etree.ElementTree as ET

    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.utils.mjcf_exporter import export_mjcf

    model = builders.jump_worm()
    xml = export_mjcf(model)
    root = ET.fromstring(xml)
    assert root.tag == "mujoco"
    bodies = root.findall(".//body")
    assert len(bodies) == model.num_bodies
    joints = root.findall(".//joint") + root.findall(".//freejoint")
    assert len(joints) >= 4  # 2 slides + 2 hinges
    assert len(root.findall(".//geom")) >= 2
    motors = root.findall(".//motor")
    assert len(motors) == model.num_actions


def test_screw_joint_dynamics():
    from nimblephysics_tpu.models.model import build_model
    from nimblephysics_tpu.ops import dynamics as dyn

    m = build_model([dict(type="screw", name="s", body_name="b", parent=-1,
                          axes=[[0.0, 0.0, 1.0], [0.05, 0.0, 0.0]],  # pitch 0.05
                          mass=1.0, moment=np.eye(3) * 0.01)])
    q = jnp.asarray([0.7])
    kin = dyn.forward_kinematics(m, q)
    # advancing q rotates about z AND translates 0.05*q along z
    np.testing.assert_allclose(float(kin.T_wb[0].p[2]), 0.05 * 0.7, atol=1e-12)
    qdd = dyn.aba(m, q, jnp.asarray([0.3]), jnp.asarray([1.0]))
    M = dyn.mass_matrix(m, q)
    C = dyn.coriolis_and_gravity(m, q, jnp.asarray([0.3]))
    qdd_ref = (1.0 - np.asarray(C)) / np.asarray(M)[0]
    np.testing.assert_allclose(np.asarray(qdd), qdd_ref.ravel(), atol=1e-9)


@needs_data
def test_universal_loader_dispatch():
    from nimblephysics_tpu.utils.universal_loader import load_world

    m1, s1 = load_world(f"{SKEL_DIR}/cartpole.skel")
    assert m1.nq == 2
    m2, s2 = load_world("/root/reference/data/urdf/KR5/KR5 sixx R650.urdf")
    assert m2.nq == 6


@needs_data
def test_sdf_parser():
    import glob

    from nimblephysics_tpu.utils.sdf_parser import parse_sdf

    candidates = sorted(glob.glob("/root/reference/data/sdf/*.sdf")) + sorted(
        glob.glob("/root/reference/data/sdf/**/*.sdf")
    )
    if not candidates:
        pytest.skip("no sdf fixtures")
    parsed = 0
    for path in candidates[:3]:
        try:
            model, s0 = parse_sdf(path)
        except ValueError:
            continue
        assert np.all(np.isfinite(np.asarray(s0.q)))
        parsed += 1
    assert parsed >= 1

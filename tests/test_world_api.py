"""World facade, timestep API, Recording, URDF loading (KR5), PerformanceLog."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.simulation.world import World, timestep
from nimblephysics_tpu.utils.perf import PerformanceLog
from nimblephysics_tpu.utils.urdf_parser import parse_urdf

KR5 = "/root/reference/data/urdf/KR5/KR5 sixx R650.urdf"


def test_world_step_and_recording():
    w = World(builders.cartpole(dt=0.02))
    w.set_state([0.0, 0.3, 0.0, 0.0])
    for _ in range(10):
        w.step([0.5])
    assert w.frame == 10
    assert abs(w.time - 0.2) < 1e-12
    assert len(w.recording) == 10
    poses = w.recording.poses()
    assert poses.shape == (10, 2)
    assert not np.allclose(poses[0], poses[-1])


def test_world_jacobians_match_fd():
    w = World(builders.cartpole(dt=0.02))
    w.set_state([0.1, 0.2, -0.1, 0.3])
    Jx = w.state_jacobian([1.0])
    assert Jx.shape == (4, 4)
    # quick FD spot check on one column
    eps = 1e-6
    x0 = w.get_state()
    w.set_state(x0 + np.asarray([eps, 0, 0, 0]))
    sp = np.asarray(timestep(w.model, w.state, jnp.asarray([1.0])).flat())
    w.set_state(x0 - np.asarray([eps, 0, 0, 0]))
    sm = np.asarray(timestep(w.model, w.state, jnp.asarray([1.0])).flat())
    w.set_state(x0)
    np.testing.assert_allclose(Jx[:, 0], (sp - sm) / (2 * eps), atol=1e-6)


def test_batched_timestep():
    model = builders.cartpole(dt=0.02)
    B = 16
    s = State(q=jnp.zeros((B, 2)).at[:, 1].set(jnp.linspace(-0.3, 0.3, B)),
              v=jnp.zeros((B, 2)))
    out = timestep(model, s, jnp.zeros((B, 1)))
    assert out.q.shape == (B, 2)


@pytest.mark.skipif(not os.path.exists(KR5), reason="KR5 urdf not mounted")
def test_kr5_urdf_loads_and_simulates():
    model, s0 = parse_urdf(KR5)
    assert model.nq == 6  # six revolute axes
    assert all(t in ("weld", "revolute") for t in model.joint_types)
    # gravity-driven motion is finite and the arm's joint limits are read
    assert np.isfinite(np.asarray(model.q_lower)).any()
    w = World(model, s0)
    for _ in range(50):
        w.step()
    assert np.all(np.isfinite(w.get_state()))
    # torque control moves joint 0
    w2 = World(model, s0)
    for _ in range(50):
        w2.step(np.asarray([20.0, 0, 0, 0, 0, 0]))
    assert abs(w2.get_positions()[0] - w.get_positions()[0]) > 1e-3


def test_performance_log():
    log = PerformanceLog()
    with log.run("replan"):
        with log.run("estimate"):
            pass
        with log.run("solve"):
            pass
    with log.run("replan"):
        with log.run("solve"):
            pass
    d = log.root.to_dict()
    replan = d["children"][0]
    assert replan["count"] == 2
    names = [c["name"] for c in replan["children"]]
    assert names == ["estimate", "solve"]
    assert "replan" in log.pretty()


def test_height_and_lowest_point():
    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.utils.helpers import get_height, get_lowest_point

    model = builders.jump_worm()
    q = jnp.zeros(model.nq)
    low = float(get_lowest_point(model, q))
    h = float(get_height(model, q))
    # worm root box half-extent 0.05 at origin
    assert abs(low - (-0.05)) < 1e-9
    assert abs(h - 0.1) < 1e-9


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/urdf/drchubo/drchubo.urdf"),
    reason="no drchubo fixture",
)
def test_humanoid_urdf_smoke():
    model, s0 = parse_urdf("/root/reference/data/urdf/drchubo/drchubo.urdf",
                           root_joint="free")
    assert model.nq > 20
    from nimblephysics_tpu.ops import dynamics as dyn

    M = dyn.mass_matrix(model, s0.q)
    assert np.all(np.isfinite(np.asarray(M)))

"""Cross-engine dynamics parity against MuJoCo (independent oracle).

The CPU reference itself cannot be built in this image (no Eigen/IPOPT and
no network — see PARITY_RESULTS.md), so articulated-dynamics correctness is
cross-validated against MuJoCo 3.x, an INDEPENDENT industrial-strength
implementation of the same rigid-body algorithms the reference uses
(Featherstone CRBA/RNEA/ABA — reference: `dart/dynamics/Skeleton.cpp:13034`).
Models are exported through our own MJCF writer
(`nimblephysics_tpu/utils/mjcf_exporter.py`, mapping
`dart/utils/MJCFExporter`), then instantaneous quantities are compared at
random states:

  * mass matrix        M(q)        vs mj_fullM
  * bias forces        C(q,v)+g    vs qfrc_bias  (rnea with qdd=0)
  * forward dynamics   qacc        vs mj_forward
  * inverse dynamics   tau         vs mj_inverse

These are integrator-independent, so they isolate the dynamics algorithms
from the (intentionally different: Nimble integrates positions with the
PRE-step velocity, `World.cpp:310-325`) integration schemes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import Model
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.utils.mjcf_exporter import export_mjcf


def _strip_contact_model(model: Model) -> Model:
    """Parity models: no shapes (pure articulated dynamics), no damping."""
    return model.replace(
        shapes=(),
        damping=jnp.zeros_like(model.damping),
        stiffness=jnp.zeros_like(model.stiffness),
        coulomb_friction=jnp.zeros_like(model.coulomb_friction),
        q_lower=jnp.full_like(model.q_lower, -np.inf),
        q_upper=jnp.full_like(model.q_upper, np.inf),
    )


def _mj_from_model(model: Model):
    xml = export_mjcf(model)
    m = mujoco.MjModel.from_xml_string(xml)
    m.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT
    d = mujoco.MjData(m)
    return m, d


def _chain_model(n=5, seed=3):
    """n-link chain with random joint types/axes/offsets/inertias."""
    rng = np.random.default_rng(seed)
    from nimblephysics_tpu.models.model import build_model
    from nimblephysics_tpu.ops.lie import Transform

    joints = []
    for i in range(n):
        ax = rng.standard_normal(3)
        ax /= np.linalg.norm(ax)
        R = np.linalg.qr(rng.standard_normal((3, 3)))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        # triangle inequality A + B >= C (MuJoCo validates principal moments)
        moment_diag = rng.uniform(0.2, 0.4, 3)
        joints.append(
            dict(
                type=rng.choice(["revolute", "prismatic"]),
                name=f"j{i}",
                body_name=f"b{i}",
                parent=i - 1,
                axes=ax[None, :],
                T_pj=Transform(jnp.asarray(R), jnp.asarray(rng.uniform(-0.3, 0.3, 3))),
                mass=float(rng.uniform(0.5, 3.0)),
                com=rng.uniform(-0.2, 0.2, 3),
                moment=np.diag(moment_diag),
            )
        )
    return build_model(joints, gravity=(0.0, -9.81, 0.0), dt=0.01)


MODELS = {
    "cartpole": lambda: _strip_contact_model(builders.cartpole()),
    "double_pendulum": lambda: _strip_contact_model(
        builders.inverted_double_pendulum()
    ),
    "random_chain5": lambda: _chain_model(5, seed=3),
    "random_chain8": lambda: _chain_model(8, seed=11),
}


@pytest.fixture(params=sorted(MODELS), ids=sorted(MODELS))
def pair(request):
    model = MODELS[request.param]()
    m, d = _mj_from_model(model)
    return model, m, d


def _rand_state(model, rng):
    q = rng.uniform(-0.8, 0.8, model.nq)
    v = rng.uniform(-1.0, 1.0, model.nq)
    return q, v


def test_mass_matrix_parity(pair):
    model, m, d = pair
    rng = np.random.default_rng(0)
    for _ in range(5):
        q, v = _rand_state(model, rng)
        d.qpos[:] = q
        mujoco.mj_forward(m, d)
        M_mj = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, M_mj)
        M_ours = np.asarray(dyn.mass_matrix(model, jnp.asarray(q)))
        np.testing.assert_allclose(M_ours, M_mj, rtol=1e-9, atol=1e-10)


def test_bias_force_parity(pair):
    model, m, d = pair
    rng = np.random.default_rng(1)
    for _ in range(5):
        q, v = _rand_state(model, rng)
        d.qpos[:] = q
        d.qvel[:] = v
        mujoco.mj_forward(m, d)
        c_ours = np.asarray(
            dyn.rnea(model, jnp.asarray(q), jnp.asarray(v), jnp.zeros(model.nq))
        )
        np.testing.assert_allclose(c_ours, d.qfrc_bias, rtol=1e-9, atol=1e-10)


def test_forward_dynamics_parity(pair):
    model, m, d = pair
    rng = np.random.default_rng(2)
    for _ in range(5):
        q, v = _rand_state(model, rng)
        tau = rng.uniform(-3.0, 3.0, model.nq)
        d.qpos[:] = q
        d.qvel[:] = v
        d.qfrc_applied[:] = tau
        mujoco.mj_forward(m, d)
        qdd_ours = np.asarray(
            dyn.aba(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau))
        )
        np.testing.assert_allclose(qdd_ours, d.qacc, rtol=1e-8, atol=1e-9)


def test_inverse_dynamics_parity(pair):
    model, m, d = pair
    rng = np.random.default_rng(4)
    for _ in range(5):
        q, v = _rand_state(model, rng)
        qdd = rng.uniform(-2.0, 2.0, model.nq)
        d.qpos[:] = q
        d.qvel[:] = v
        d.qacc[:] = qdd
        mujoco.mj_inverse(m, d)
        tau_ours = np.asarray(
            dyn.rnea(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(qdd))
        )
        np.testing.assert_allclose(tau_ours, d.qfrc_inverse, rtol=1e-8, atol=1e-9)

"""Programmatic builders for the canonical benchmark worlds.

These mirror the reference's example/test scenes (SURVEY.md §6 parity
configs): double pendulum & cartpole (`data/skel/*.skel`), catapult and
jump-worm (`python/nimblephysics_examples/{catapult,jump_worm}.py`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, ShapeSpec, build_model
from nimblephysics_tpu.ops.lie import Transform
from nimblephysics_tpu.ops import spatial


def _tf(p=(0, 0, 0), R=None) -> Transform:
    return Transform(
        np.eye(3) if R is None else np.asarray(R, dtype=np.float64),
        np.asarray(p, dtype=np.float64),
    )


def pendulum(n_links: int = 1, dt: float = 0.01, damping: float = 0.0) -> Model:
    """Chain of revolute joints about z, each link a unit point mass 1m below
    the joint. Ground truth for analytic checks."""
    joints = []
    for i in range(n_links):
        joints.append(
            dict(
                type="revolute",
                name=f"j{i}",
                body_name=f"link{i}",
                parent=i - 1,
                axes=[[0.0, 0.0, 1.0]],
                T_pj=_tf() if i == 0 else _tf([0.0, -1.0, 0.0]),
                mass=1.0,
                com=[0.0, -1.0, 0.0],
                moment=np.eye(3) * 1e-8,
                damping=damping,
            )
        )
    return build_model(joints, dt=dt)


def inverted_double_pendulum(dt: float = 0.01) -> Model:
    """data/skel/inverted_double_pendulum.skel: cart (prismatic x) + two
    poles (revolute z, damping 0.1) + welded tip weight. Skeleton frame is
    offset by (0, -0.35, 0); body frames coincide with the skeleton frame
    chain as given in the file (joint frames at body origins)."""
    sk = np.array([0.0, -0.35, 0.0])
    # Body world positions (from the .skel <transformation> of each body).
    cart_p = sk + np.array([0.0, 0.0, 0.0])
    pole_p = sk + np.array([0.0, 0.0, 0.0])
    pole2_p = sk + np.array([0.0, 0.3, 0.0])
    weight_p = sk + np.array([0.0, 0.62, 0.0])
    joints = [
        dict(
            type="prismatic", name="j_cart", body_name="cart", parent=-1,
            axes=[[1.0, 0.0, 0.0]], T_pj=_tf(cart_p),
            mass=0.75, com=[0.0, 0.0, 0.0],
            moment=spatial.box_inertia(jnp.asarray(0.75), jnp.asarray([0.2, 0.05, 0.05])),
        ),
        dict(
            type="revolute", name="j_pole", body_name="pole", parent=0,
            axes=[[0.0, 0.0, 1.0]], T_pj=_tf(pole_p - cart_p),
            mass=0.025, com=[0.0, 0.15, 0.0],
            moment=spatial.box_inertia(jnp.asarray(0.025), jnp.asarray([0.02, 0.3, 0.02])),
            damping=0.1,
        ),
        dict(
            type="revolute", name="j_pole2", body_name="pole2", parent=1,
            axes=[[0.0, 0.0, 1.0]], T_pj=_tf(pole2_p - pole_p),
            mass=0.025, com=[0.0, 0.15, 0.0],
            moment=spatial.box_inertia(jnp.asarray(0.025), jnp.asarray([0.02, 0.3, 0.02])),
            damping=0.1,
        ),
        dict(
            type="weld", name="j_con", body_name="weight", parent=2,
            T_pj=_tf(weight_p - pole2_p),
            mass=0.3, com=[0.0, 0.0, 0.0],
            moment=spatial.box_inertia(jnp.asarray(0.3), jnp.asarray([0.08, 0.04, 0.08])),
        ),
    ]
    # Action space: cart force only (classic swing-up).
    return build_model(joints, dt=dt, actuated=(0,))


def cartpole(dt: float = 0.02) -> Model:
    """data/skel/cartpole.skel (mobile skeleton only): prismatic cart +
    revolute pole (axis -z), both with damping 1.0 and position limits."""
    joints = [
        dict(
            type="prismatic", name="j_cart", body_name="cart", parent=-1,
            axes=[[1.0, 0.0, 0.0]],
            mass=9.42477796, com=[0.0, 0.0, 0.0],
            moment=spatial.capsule_inertia(
                jnp.asarray(9.42477796), jnp.asarray(0.1), jnp.asarray(0.2)
            ),
            damping=1.0, q_lower=-1.0, q_upper=1.0,
        ),
        dict(
            type="revolute", name="j_pole", body_name="pole", parent=0,
            axes=[[0.0, 0.0, -1.0]],
            mass=4.8953899, com=[0.0, 0.3, 0.0],
            moment=spatial.capsule_inertia(
                jnp.asarray(4.8953899), jnp.asarray(0.049), jnp.asarray(0.6)
            ),
            damping=1.0, q_lower=-1.57, q_upper=1.57,
        ),
    ]
    return build_model(joints, dt=dt, actuated=(0,))


def catapult(dt: float = 0.002) -> Model:
    """python/nimblephysics_examples/catapult.py: a 2D projectile
    (translational2d, unactuated) + 3-link catapult tail on a welded root,
    with box collision shapes and a welded floor."""
    joints = [
        dict(
            type="translational2d", name="projectile_joint",
            body_name="projectile", parent=-1,
            axes=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            mass=1.0, tau_lower=0.0, tau_upper=0.0,
        ),
        dict(
            type="weld", name="root_joint", body_name="root", parent=-1,
            T_pj=_tf([0.5, -0.45, 0.0]), mass=1.0,
        ),
    ]
    parent = 1
    for k in range(3):
        joints.append(
            dict(
                type="revolute", name=f"tail{k}_joint", body_name=f"tail{k}",
                parent=parent, axes=[[0.0, 0.0, 1.0]],
                T_pj=_tf([0.0, 0.125, 0.0]) if k > 0 else _tf(),
                T_cj=_tf([0.0, -0.125, 0.0]),
                mass=1.0,
                tau_lower=-1000.0, tau_upper=1000.0,
                q_lower=0.0, q_upper=np.pi,
            )
        )
        parent = 2 + k
    shapes = (
        ShapeSpec(kind="box", body_index=0, offset=_tf(),
                  params=jnp.asarray([0.1, 0.1, 0.1, 0.0])),
        ShapeSpec(kind="box", body_index=4, offset=_tf(),
                  params=jnp.asarray([0.05, 0.25, 0.05, 0.0])),
        # floor: box at (0, -0.7, 0) size (3.5, 0.25, 0.5) approximated as a
        # halfspace y >= -0.575 for the projectile's flight corridor
        ShapeSpec(kind="halfspace", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.0, 1.0, 0.0, -0.575])),
    )
    return build_model(joints, dt=dt, shapes=shapes, actuated=(2, 3, 4))


def jump_worm(dt: float = 0.001) -> Model:
    """python/nimblephysics_examples/jump_worm.py: 2D root + two revolute
    links over a floor."""
    joints = [
        dict(
            type="translational2d", name="root_joint", body_name="root",
            parent=-1, axes=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            mass=1.0, tau_lower=0.0, tau_upper=0.0,
        ),
        dict(
            type="revolute", name="pole1_joint", body_name="pole1", parent=0,
            axes=[[0.0, 0.0, 1.0]], T_cj=_tf([0.0, -0.125, 0.0]),
            mass=1.0, tau_lower=-100.0, tau_upper=100.0,
            q_lower=0.0, q_upper=np.pi,
        ),
        dict(
            type="revolute", name="pole2_joint", body_name="pole2", parent=1,
            axes=[[0.0, 0.0, 1.0]], T_pj=_tf([0.0, 0.125, 0.0]),
            T_cj=_tf([0.0, -0.125, 0.0]),
            mass=1.0, tau_lower=-100.0, tau_upper=100.0,
            q_lower=0.0, q_upper=np.pi,
        ),
    ]
    shapes = (
        ShapeSpec(kind="box", body_index=0, offset=_tf(),
                  params=jnp.asarray([0.1, 0.1, 0.1, 0.0])),
        # floor box center (0,-0.7,0), height 0.25 -> top surface y = -0.575
        ShapeSpec(kind="halfspace", body_index=-1, offset=_tf(),
                  params=jnp.asarray([0.0, 1.0, 0.0, -0.575])),
    )
    return build_model(joints, dt=dt, shapes=shapes, actuated=(2, 3))

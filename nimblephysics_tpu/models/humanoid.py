"""Humanoid-class (Atlas) planner models.

The reference ships Boston Dynamics Atlas as its humanoid workload
(/root/reference/data/sdf/atlas/atlas_v3_box_colliders.urdf, exercised by
/root/reference/unittests/comprehensive/test_AtlasTrajectory.cpp:1 and the
MPC examples). This module builds the same robot as a TPU planner model:

  * feet-only planner contact set (the MPC practice the bench configs
    use — `ops/frozen_contact.planner_reduce_contacts`),
  * a ground halfspace,
  * an EulerFreeJoint root: gimbal-coordinate free joint with LINEAR
    position integration — the biomech-standard root that keeps the
    planner step lane-evaluable (the exp-map free root's `logm_so3`
    branch select is not; BIGMODEL_STUDY.md wall 2),
  * a `no_collide` filter on the foot-foot pair (its box-box edge-SAT
    narrow phase is gather-based; the feet never touch in standing/
    walking tasks).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from nimblephysics_tpu.models.model import Model, ShapeSpec, State
from nimblephysics_tpu.ops.lie import Transform

ATLAS_URDF = "/root/reference/data/sdf/atlas/atlas_v3_box_colliders.urdf"


def atlas(root_joint: str = "euler_free") -> Tuple[Model, State]:
    """The full Atlas plant model (nq = 33, 34 bodies, box colliders)."""
    from nimblephysics_tpu.utils.urdf_parser import parse_urdf

    model, s0 = parse_urdf(ATLAS_URDF, root_joint="free")
    if root_joint == "euler_free":
        jt = list(model.joint_types)
        jt[0] = "euler_free"
        model = model.replace(joint_types=tuple(jt))
    return model, s0


def atlas_planner() -> Tuple[Model, State]:
    """The feet-ground planner reduction of `atlas` (m = 102 LCP rows:
    2 feet x 8 corner slots x 3 friction rows + 54 joint-limit rows)."""
    from nimblephysics_tpu.ops.frozen_contact import planner_reduce_contacts

    model, s0 = atlas()
    feet = ["l_foot", "r_foot"]
    planner = planner_reduce_contacts(model, feet)
    floor = ShapeSpec(
        kind="halfspace", body_index=-1,
        offset=Transform(jnp.eye(3), jnp.zeros(3)),
        params=jnp.asarray([0.0, 0.0, 1.0, 0.0]),
    )
    fi = [model.body_names.index(f) for f in feet]
    planner = planner.replace(
        shapes=planner.shapes + (floor,),
        no_collide=((fi[0], fi[1]),),
    )
    return planner, s0

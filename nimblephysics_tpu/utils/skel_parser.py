"""DART `.skel` world parser (XML) — maps `dart/utils/SkelParser.cpp`.

Parses the subset of the format the reference's benchmark scenes use
(data/skel/{cartpole,half_cheetah,inverted_double_pendulum,...}.skel):
physics (time_step/gravity), skeletons with <mobile>, bodies with
transformation/inertia/box-sphere-capsule shapes, and the joint types
weld/free/ball/revolute/prismatic/universal/planar/translational/euler.

Frame semantics (SkelParser.cpp):
  * skeleton <transformation> W: world pose of the skeleton frame
  * body <transformation> B: pose of the body frame in the skeleton frame
  * joint <transformation> J: pose of the joint frame in the CHILD body
    frame (T_cj); T_pj = B_parent⁻¹ B_child J
  * joint axes are expressed in the joint frame
  * missing <moment_of_inertia>: moment of the FIRST shape, UNROTATED by
    the shape offset (SkelParser.cpp:624-635 — a reference quirk we keep
    for parity)

Immobile skeletons become static collision geometry; their boxes turn into
+Y-face halfspaces (every reference scene uses a big static box as the
ground plane).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, ShapeSpec, State, build_model
from nimblephysics_tpu.ops import spatial
from nimblephysics_tpu.ops.lie import Transform, euler_xyz_to_matrix


def _vec(text: str) -> np.ndarray:
    return np.asarray([float(x) for x in text.split()])


def _tf(elem: Optional[ET.Element]) -> Tuple[np.ndarray, np.ndarray]:
    """<transformation>x y z rx ry rz</transformation> -> (R, p).
    Rotation = eulerXYZToMatrix (SkelParser convention)."""
    if elem is None or elem.text is None:
        return np.eye(3), np.zeros(3)
    v = _vec(elem.text)
    R = np.asarray(euler_xyz_to_matrix(jnp.asarray(v[3:6])))
    return R, v[0:3]


def _compose(Ra, pa, Rb, pb):
    return Ra @ Rb, Ra @ pb + pa


def _inv(R, p):
    return R.T, -R.T @ p


_JOINT_MAP = {
    "weld": "weld",
    "free": "free",
    "ball": "ball",
    "revolute": "revolute",
    "prismatic": "prismatic",
    "universal": "universal",
    "planar": "planar",
    "translational": "translational",
    "euler": "euler_xyz",
}


def _shape_geometry(geom: ET.Element):
    """-> (kind, params[4]) or None for unsupported geometry."""
    for child in geom:
        tag = child.tag
        if tag == "box":
            size = _vec(child.find("size").text)
            return "box", np.asarray([size[0], size[1], size[2], 0.0])
        if tag == "sphere":
            r = float(child.find("radius").text)
            return "sphere", np.asarray([r, 0.0, 0.0, 0.0])
        if tag in ("capsule", "cylinder", "cone"):
            r = float(child.find("radius").text)
            h = float(child.find("height").text)
            # true flat-cap cylinder / cone narrow phases (reference:
            # DARTCollide.hpp:271-295), no longer aliased to capsule
            return tag, np.asarray([r, h, 0.0, 0.0])
        if tag == "ellipsoid":
            size = _vec(child.find("size").text)
            return "ellipsoid", np.asarray([size[0], size[1], size[2], 0.0])
    return None


def _shape_moment(kind: str, params: np.ndarray, mass: float) -> np.ndarray:
    m = jnp.asarray(float(mass))
    if kind == "box":
        return np.asarray(spatial.box_inertia(m, jnp.asarray(params[:3])))
    if kind == "sphere":
        return np.asarray(spatial.sphere_inertia(m, jnp.asarray(params[0])))
    if kind == "capsule":
        return np.asarray(
            spatial.capsule_inertia(m, jnp.asarray(params[0]), jnp.asarray(params[1]))
        )
    if kind == "ellipsoid":
        return np.asarray(spatial.ellipsoid_inertia(m, jnp.asarray(params[:3])))
    if kind == "cylinder":
        return np.asarray(
            spatial.cylinder_inertia(m, jnp.asarray(params[0]), jnp.asarray(params[1]))
        )
    if kind == "cone":
        return np.asarray(
            spatial.cone_inertia(m, jnp.asarray(params[0]), jnp.asarray(params[1]))
        )
    return np.eye(3)


def parse_skel(path: str, dtype=None) -> Tuple[Model, State]:
    """Load a .skel world file -> (Model, initial State)."""
    tree = ET.parse(path)
    root = tree.getroot()
    world = root.find("world") if root.tag != "world" else root

    dt = 0.001
    gravity = np.asarray([0.0, -9.81, 0.0])
    physics = world.find("physics")
    if physics is not None:
        ts = physics.find("time_step")
        if ts is not None:
            dt = float(ts.text)
        g = physics.find("gravity")
        if g is not None:
            gravity = _vec(g.text)

    joints_out: List[dict] = []
    shapes_out: List[ShapeSpec] = []
    init_q: List[float] = []
    init_v: List[float] = []
    # map "skelname/bodyname" -> global body index
    body_index = {}

    for skel in world.findall("skeleton"):
        skel_name = skel.get("name", "skeleton")
        mobile_el = skel.find("mobile")
        mobile = mobile_el is None or mobile_el.text.strip().lower() not in (
            "false", "0",
        )
        RW, pW = _tf(skel.find("transformation"))

        # body world poses (within this file's frames)
        bodies = {}
        body_order = []
        for body in skel.findall("body"):
            name = body.get("name")
            Rb, pb = _tf(body.find("transformation"))
            Rw, pw = _compose(RW, pW, Rb, pb)
            bodies[name] = dict(R=Rw, p=pw, elem=body)
            body_order.append(name)

        if not mobile:
            # static geometry only
            for name in body_order:
                b = bodies[name]
                for cs in b["elem"].findall("collision_shape"):
                    geom = cs.find("geometry")
                    parsed = _shape_geometry(geom)
                    if parsed is None:
                        continue
                    kind, params = parsed
                    Rs, ps = _tf(cs.find("transformation"))
                    Rw, pw = _compose(b["R"], b["p"], Rs, ps)
                    if kind == "box":
                        # ground boxes -> +Y-face halfspace in world frame
                        n = Rw @ np.asarray([0.0, 1.0, 0.0])
                        top = pw + n * params[1] / 2.0
                        shapes_out.append(
                            ShapeSpec(
                                kind="halfspace", body_index=-1,
                                offset=Transform(jnp.eye(3), jnp.zeros(3)),
                                params=jnp.asarray(
                                    [n[0], n[1], n[2], float(n @ top)]
                                ),
                            )
                        )
                    else:
                        shapes_out.append(
                            ShapeSpec(
                                kind=kind, body_index=-1,
                                offset=Transform(jnp.asarray(Rw), jnp.asarray(pw)),
                                params=jnp.asarray(params),
                            )
                        )
            continue

        # mobile skeleton: walk joints
        for joint in skel.findall("joint"):
            jtype_raw = joint.get("type")
            if jtype_raw not in _JOINT_MAP:
                raise ValueError(f"unsupported joint type {jtype_raw!r}")
            jtype = _JOINT_MAP[jtype_raw]
            jname = joint.get("name", f"joint{len(joints_out)}")
            parent_name = joint.find("parent").text.strip()
            child_name = joint.find("child").text.strip()
            child = bodies[child_name]

            # T_cj from the joint's <transformation> (pose of joint in child)
            Rj, pj = _tf(joint.find("transformation"))

            if parent_name == "world":
                Rp, pp = np.eye(3), np.zeros(3)
                parent_idx = -1
            else:
                par = bodies[parent_name]
                Rp, pp = par["R"], par["p"]
                parent_idx = body_index[f"{skel_name}/{parent_name}"]

            # T_pj = (world pose of parent)⁻¹ (world pose of child) T_cj
            Rpi, ppi = _inv(Rp, pp)
            Rpc, ppc = _compose(Rpi, ppi, child["R"], child["p"])
            Rpj, ppj = _compose(Rpc, ppc, Rj, pj)

            # axes + per-dof dynamics
            axes = []
            damping, stiffness, rest = [], [], []
            q_lo, q_hi = [], []
            for axis_tag in ("axis", "axis2", "axis3"):
                ax = joint.find(axis_tag)
                if ax is None:
                    continue
                xyz = ax.find("xyz")
                if xyz is not None:
                    axes.append(_vec(xyz.text))
                dyn_el = ax.find("dynamics")
                damping.append(
                    float(dyn_el.find("damping").text)
                    if dyn_el is not None and dyn_el.find("damping") is not None
                    else 0.0
                )
                stiffness.append(
                    float(dyn_el.find("stiffness").text)
                    if dyn_el is not None and dyn_el.find("stiffness") is not None
                    else 0.0
                )
                rest.append(0.0)
                lim = ax.find("limit")
                q_lo.append(
                    float(lim.find("lower").text)
                    if lim is not None and lim.find("lower") is not None
                    else -np.inf
                )
                q_hi.append(
                    float(lim.find("upper").text)
                    if lim is not None and lim.find("upper") is not None
                    else np.inf
                )

            from nimblephysics_tpu.models.model import JOINT_NDOF

            nd = JOINT_NDOF[jtype]
            # pad per-dof lists to the joint's dof count
            def pad(lst, fill):
                return (lst + [fill] * nd)[:nd]

            # inertia
            inertia_el = child["elem"].find("inertia")
            mass = 1.0
            com = np.zeros(3)
            moment = None
            if inertia_el is not None:
                if inertia_el.find("mass") is not None:
                    mass = float(inertia_el.find("mass").text)
                if inertia_el.find("offset") is not None:
                    com = _vec(inertia_el.find("offset").text)
                moi = inertia_el.find("moment_of_inertia")
                if moi is not None:
                    vals = {t: float(moi.find(t).text) for t in
                            ("ixx", "iyy", "izz", "ixy", "ixz", "iyz")}
                    moment = np.asarray(
                        spatial.moment_from_params(jnp.asarray([
                            vals["ixx"], vals["iyy"], vals["izz"],
                            vals["ixy"], vals["ixz"], vals["iyz"],
                        ]))
                    )
            if moment is None:
                # reference quirk: first shape's inertia, unrotated
                moment = np.eye(3)
                for st in ("visualization_shape", "collision_shape"):
                    se = child["elem"].find(st)
                    if se is not None:
                        parsed = _shape_geometry(se.find("geometry"))
                        if parsed is not None:
                            moment = _shape_moment(parsed[0], parsed[1], mass)
                            break

            gidx = len(joints_out)
            body_index[f"{skel_name}/{child_name}"] = gidx
            joints_out.append(
                dict(
                    type=jtype,
                    name=f"{skel_name}/{jname}",
                    body_name=f"{skel_name}/{child_name}",
                    parent=parent_idx,
                    T_pj=Transform(Rpj, ppj),
                    T_cj=Transform(Rj, pj),
                    axes=np.asarray(axes) if axes else None,
                    mass=mass,
                    com=com,
                    moment=moment,
                    damping=pad(damping, 0.0),
                    stiffness=pad(stiffness, 0.0),
                    q_lower=pad(q_lo, -np.inf),
                    q_upper=pad(q_hi, np.inf),
                )
            )

            # init pos/vel
            def init_vals(tag):
                el = joint.find(tag)
                if el is None or el.text is None:
                    return [0.0] * nd
                vals = list(_vec(el.text))
                return (vals + [0.0] * nd)[:nd]

            init_q.extend(init_vals("init_pos"))
            init_v.extend(init_vals("init_vel"))

            # collision shapes on the child body
            for cs in child["elem"].findall("collision_shape"):
                parsed = _shape_geometry(cs.find("geometry"))
                if parsed is None:
                    continue
                kind, params = parsed
                Rs, ps = _tf(cs.find("transformation"))
                shapes_out.append(
                    ShapeSpec(
                        kind=kind, body_index=gidx,
                        offset=Transform(jnp.asarray(Rs), jnp.asarray(ps)),
                        params=jnp.asarray(params),
                    )
                )

    model = build_model(
        joints_out, gravity=gravity, dt=dt, shapes=tuple(shapes_out), dtype=dtype
    )
    state = State(
        q=jnp.asarray(np.asarray(init_q), dtype=model.mass.dtype),
        v=jnp.asarray(np.asarray(init_v), dtype=model.mass.dtype),
    )
    return model, state

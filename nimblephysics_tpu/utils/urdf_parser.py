"""URDF robot parser — maps `dart/utils/urdf/DartLoader`.

Supports the subset the reference's benchmark robots need (KR5, cartpole
urdf, atlas-like arms): links with <inertial> (origin xyz/rpy, mass, full
inertia tensor rotated into the link frame), joints fixed/revolute/
continuous/prismatic/floating/planar with <origin>, <axis>, <dynamics>,
<limit>, and collision geometry: box/sphere/cylinder≈capsule primitives
plus mesh files (obj/stl), which become decimated convex hulls
(utils/mesh.py; the reference routes meshes through assimp+libccd
for the benchmark configs).

URDF frame semantics: a joint's <origin> is the pose of the child link (=
joint frame) in the parent link frame -> T_pj = origin, T_cj = identity,
axes in the joint frame. <origin rpy> is fixed-axis RPY: R = Rz Ry Rx.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, ShapeSpec, State, build_model
from nimblephysics_tpu.ops.lie import Transform, expm_so3
from nimblephysics_tpu.ops import spatial


def _rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    r = np.asarray(expm_so3(jnp.asarray([0.0, 0.0, rpy[2]])))
    p = np.asarray(expm_so3(jnp.asarray([0.0, rpy[1], 0.0])))
    y = np.asarray(expm_so3(jnp.asarray([rpy[0], 0.0, 0.0])))
    return r @ p @ y


def _origin(elem: Optional[ET.Element]) -> Tuple[np.ndarray, np.ndarray]:
    if elem is None:
        return np.eye(3), np.zeros(3)
    xyz = np.asarray([float(x) for x in elem.get("xyz", "0 0 0").split()])
    rpy = np.asarray([float(x) for x in elem.get("rpy", "0 0 0").split()])
    return _rpy_matrix(rpy), xyz


_TYPE_MAP = {
    "fixed": "weld",
    "revolute": "revolute",
    "continuous": "revolute",
    "prismatic": "prismatic",
    "floating": "free",
    "planar": "planar",
}


def _resolve_mesh_path(uri: str, base_dir: str) -> Optional[str]:
    """file://, package://pkg/..., or relative path -> existing file path.
    Mirrors the reference's resource-retriever fallbacks
    (dart/utils/urdf/DartLoader URI resolution)."""
    candidates = []
    if uri.startswith("package://"):
        rest = uri[len("package://"):]
        # try with and without the package-name prefix, walking up from the
        # urdf's directory
        parts = rest.split("/", 1)
        d = base_dir
        for _ in range(6):
            candidates.append(os.path.join(d, rest))
            if len(parts) == 2:
                candidates.append(os.path.join(d, parts[1]))
            d = os.path.dirname(d)
    elif uri.startswith("file://"):
        candidates.append(uri[len("file://"):])
    else:
        candidates.append(os.path.join(base_dir, uri))
        candidates.append(uri)
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def _geometry(geom: Optional[ET.Element], base_dir: str = ""):
    """-> (kind, params, vertices, faces) or None."""
    if geom is None:
        return None
    for child in geom:
        if child.tag == "box":
            size = np.asarray([float(x) for x in child.get("size").split()])
            return "box", np.asarray([size[0], size[1], size[2], 0.0]), None, None
        if child.tag == "sphere":
            r = float(child.get("radius"))
            return "sphere", np.asarray([r, 0.0, 0.0, 0.0]), None, None
        if child.tag in ("cylinder", "capsule"):
            r = float(child.get("radius"))
            h = float(child.get("length", child.get("height", "0")))
            return child.tag, np.asarray([r, h, 0.0, 0.0]), None, None
        if child.tag == "mesh":
            path = _resolve_mesh_path(child.get("filename", ""), base_dir)
            if path is None:
                return None
            scale = np.asarray(
                [float(x) for x in child.get("scale", "1 1 1").split()]
            )
            try:
                from nimblephysics_tpu.utils.mesh import load_collision_hull
                verts, faces = load_collision_hull(path, scale=scale)
            except (ValueError, OSError):
                return None
            return "convex", np.zeros(4), verts, faces
    return None


def parse_urdf(
    path: str,
    root_joint: str = "as_specified",
    dtype=None,
) -> Tuple[Model, State]:
    """Load a URDF file -> (Model, zero State).

    root_joint: "as_specified" keeps the file's structure (links with no
    parent joint are welded to the world at identity unless the file uses a
    "world" link); "free" mounts the root link on a free joint (DartLoader's
    default for un-rooted robots).
    """
    tree = ET.parse(path)
    robot = tree.getroot()
    base_dir = os.path.dirname(os.path.abspath(path))

    links = {}
    for link in robot.findall("link"):
        links[link.get("name")] = link

    # child link name -> (joint elem)
    joints_by_child = {}
    children = {name: [] for name in links}
    has_parent = set()
    for joint in robot.findall("joint"):
        parent = joint.find("parent").get("link")
        child = joint.find("child").get("link")
        joints_by_child[child] = joint
        if parent in children:
            children[parent].append(child)
        has_parent.add(child)

    roots = [n for n in links if n not in has_parent]

    joints_out = []
    shapes_out = []
    body_index = {}

    def add_link(link_name: str, parent_idx: int):
        link = links[link_name]
        jelem = joints_by_child.get(link_name)
        if jelem is None:
            jtype = "free" if root_joint == "free" else "weld"
            Rpj, ppj = np.eye(3), np.zeros(3)
            jname = f"root_{link_name}"
            axes = None
            damping = 0.0
            q_lo, q_hi, t_lo, t_hi = -np.inf, np.inf, -np.inf, np.inf
        else:
            jtype = _TYPE_MAP[jelem.get("type")]
            jname = jelem.get("name")
            Rpj, ppj = _origin(jelem.find("origin"))
            axis_el = jelem.find("axis")
            axes = (
                [np.asarray([float(x) for x in axis_el.get("xyz").split()])]
                if axis_el is not None
                else [np.asarray([1.0, 0.0, 0.0])]
            )
            dyn_el = jelem.find("dynamics")
            damping = (
                float(dyn_el.get("damping", "0")) if dyn_el is not None else 0.0
            )
            lim = jelem.find("limit")
            if lim is not None and jelem.get("type") != "continuous":
                q_lo = float(lim.get("lower", "-inf"))
                q_hi = float(lim.get("upper", "inf"))
                eff = float(lim.get("effort", "inf"))
                t_lo, t_hi = -eff, eff
            else:
                q_lo, q_hi, t_lo, t_hi = -np.inf, np.inf, -np.inf, np.inf

        # inertial
        mass, com, moment = 1.0, np.zeros(3), np.eye(3)
        inertial = link.find("inertial")
        if inertial is not None:
            if inertial.find("mass") is not None:
                mass = float(inertial.find("mass").get("value"))
            Ri, pi = _origin(inertial.find("origin"))
            com = pi
            in_el = inertial.find("inertia")
            if in_el is not None:
                I_local = np.asarray(
                    spatial.moment_from_params(jnp.asarray([
                        float(in_el.get("ixx", "0")),
                        float(in_el.get("iyy", "0")),
                        float(in_el.get("izz", "0")),
                        float(in_el.get("ixy", "0")),
                        float(in_el.get("ixz", "0")),
                        float(in_el.get("iyz", "0")),
                    ]))
                )
                moment = Ri @ I_local @ Ri.T  # rotate into the link frame

        gidx = len(joints_out)
        body_index[link_name] = gidx
        joints_out.append(
            dict(
                type=jtype,
                name=jname,
                body_name=link_name,
                parent=parent_idx,
                T_pj=Transform(Rpj, ppj),
                axes=np.asarray(axes) if axes is not None else None,
                mass=mass,
                com=com,
                moment=moment,
                damping=damping,
                q_lower=q_lo,
                q_upper=q_hi,
                tau_lower=t_lo,
                tau_upper=t_hi,
            )
        )

        for col in link.findall("collision"):
            parsed = _geometry(col.find("geometry"), base_dir)
            if parsed is None:
                continue
            kind, params, verts, faces = parsed
            Rs, ps = _origin(col.find("origin"))
            shapes_out.append(
                ShapeSpec(
                    kind=kind, body_index=gidx,
                    offset=Transform(jnp.asarray(Rs), jnp.asarray(ps)),
                    params=jnp.asarray(params),
                    vertices=jnp.asarray(verts) if verts is not None else None,
                    faces=jnp.asarray(faces) if faces is not None else None,
                )
            )

        for child_name in children.get(link_name, []):
            add_link(child_name, gidx)

    for root in roots:
        if root == "world":
            # "world" link is the fixed frame itself: its children are roots
            for child_name in children.get(root, []):
                add_link(child_name, -1)
        else:
            add_link(root, -1)

    model = build_model(joints_out, shapes=tuple(shapes_out), dtype=dtype)
    nq = model.nq
    state = State(q=jnp.zeros(nq, model.mass.dtype), v=jnp.zeros(nq, model.mass.dtype))
    return model, state

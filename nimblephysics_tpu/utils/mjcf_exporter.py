"""MJCF (MuJoCo XML) exporter — maps `dart/utils/MJCFExporter`.

Writes a Model as a MuJoCo scene: the body tree with per-body pos/quat
(the zero-configuration child-to-parent transform), joints expressed in
the child body frame, collision geoms, inertials, and actuators for the
actuated dofs.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np

from nimblephysics_tpu.models.model import JOINT_NDOF, Model
from nimblephysics_tpu.ops import joints as J
from nimblephysics_tpu.ops.lie import Transform

import jax.numpy as jnp


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion from a rotation matrix."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
             (R[1, 0] - R[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def _fmt(v) -> str:
    return " ".join(f"{float(x):.17g}" for x in np.atleast_1d(np.asarray(v)))


def export_mjcf(model: Model, name: str = "nimble_world") -> str:
    """Return the MJCF XML string for the model."""
    root = ET.Element("mujoco", model=name)
    ET.SubElement(
        root, "option",
        timestep=f"{float(model.dt):.17g}",
        gravity=_fmt(model.gravity),
    )
    worldbody = ET.SubElement(root, "worldbody")

    # static geometry
    for si, shape in enumerate(model.shapes):
        if shape.body_index >= 0:
            continue
        _emit_geom(worldbody, shape, f"static_{si}")

    # body tree (children of each parent)
    children = {i: [] for i in range(-1, model.num_bodies)}
    for i, p in enumerate(model.parents):
        children[p].append(i)

    def emit_body(parent_el, i):
        jt = model.joint_types[i]
        qz = np.zeros(JOINT_NDOF[jt])
        T_pj = Transform(model.T_pj.R[i], model.T_pj.p[i])
        T_cj = Transform(model.T_cj.R[i], model.T_cj.p[i])
        Q = J.joint_transform(jt, jnp.asarray(qz), model.axes[i])
        T_pc = T_pj.compose(Q).compose(T_cj.inverse())
        body = ET.SubElement(
            parent_el, "body", name=model.body_names[i],
            pos=_fmt(T_pc.p), quat=_fmt(_quat_from_R(np.asarray(T_pc.R))),
        )
        ET.SubElement(
            body, "inertial",
            pos=_fmt(model.com[i]),
            mass=f"{float(model.mass[i]):.17g}",
            fullinertia=_fmt([
                model.moment[i, 0, 0], model.moment[i, 1, 1],
                model.moment[i, 2, 2], model.moment[i, 0, 1],
                model.moment[i, 0, 2], model.moment[i, 1, 2],
            ]),
        )
        sl = model.joint_slice(i)
        axes = np.asarray(model.axes[i])
        jpos = np.asarray(T_cj.p)
        jaxis = np.asarray(T_cj.R)
        if jt == "free":
            ET.SubElement(body, "freejoint", name=model.joint_names[i])
        elif jt == "ball":
            ET.SubElement(body, "joint", name=model.joint_names[i],
                          type="ball", pos=_fmt(jpos))
        elif jt in ("revolute", "prismatic"):
            kind = "hinge" if jt == "revolute" else "slide"
            attrs = dict(
                name=model.joint_names[i], type=kind, pos=_fmt(jpos),
                axis=_fmt(jaxis @ axes[0]),
            )
            lo = float(model.q_lower[sl.start])
            hi = float(model.q_upper[sl.start])
            if np.isfinite(lo) and np.isfinite(hi):
                attrs["range"] = _fmt([lo, hi])
                attrs["limited"] = "true"
            d = float(model.damping[sl.start])
            if d:
                attrs["damping"] = f"{d:.17g}"
            ET.SubElement(body, "joint", **attrs)
        elif jt in ("universal", "translational2d", "translational", "planar",
                    "euler_xyz", "euler_zyx"):
            kinds = {
                "universal": ("hinge", "hinge"),
                "translational2d": ("slide", "slide"),
                "translational": ("slide", "slide", "slide"),
                "planar": ("slide", "slide", "hinge"),
                "euler_xyz": ("hinge", "hinge", "hinge"),
                "euler_zyx": ("hinge", "hinge", "hinge"),
            }[jt]
            for d_i, kind in enumerate(kinds):
                ET.SubElement(
                    body, "joint",
                    name=f"{model.joint_names[i]}_{d_i}", type=kind,
                    pos=_fmt(jpos), axis=_fmt(jaxis @ axes[min(d_i, 2)]),
                )
        # weld: no joint element
        for si, shape in enumerate(model.shapes):
            if shape.body_index == i:
                _emit_geom(body, shape, f"geom_{i}_{si}")
        for c in children[i]:
            emit_body(body, c)

    for i in children[-1]:
        emit_body(worldbody, i)

    # actuators
    if model.actuated:
        actuators = ET.SubElement(root, "actuator")
        dof_joint = []
        for i in range(model.num_bodies):
            nd = JOINT_NDOF[model.joint_types[i]]
            for d in range(nd):
                dof_joint.append((i, d, nd))
        for a in model.actuated:
            i, d, nd = dof_joint[a]
            jname = (
                model.joint_names[i] if nd == 1 else f"{model.joint_names[i]}_{d}"
            )
            ET.SubElement(actuators, "motor", joint=jname, name=f"act_{a}")

    ET.indent(root)
    return ET.tostring(root, encoding="unicode")


def _emit_geom(parent_el, shape, name: str) -> None:
    params = np.asarray(shape.params)
    pos = np.asarray(shape.offset.p)
    quat = _quat_from_R(np.asarray(shape.offset.R))
    if shape.kind == "box":
        ET.SubElement(parent_el, "geom", name=name, type="box",
                      size=_fmt(params[:3] / 2.0), pos=_fmt(pos),
                      quat=_fmt(quat))
    elif shape.kind == "sphere":
        ET.SubElement(parent_el, "geom", name=name, type="sphere",
                      size=_fmt([params[0]]), pos=_fmt(pos))
    elif shape.kind == "capsule":
        ET.SubElement(parent_el, "geom", name=name, type="capsule",
                      size=_fmt([params[0], params[1] / 2.0]), pos=_fmt(pos),
                      quat=_fmt(quat))
    elif shape.kind == "halfspace":
        n = params[:3]
        # represent as a large thin plane geom oriented by the normal
        z = np.asarray([0.0, 0.0, 1.0])
        v = np.cross(z, n)
        c = float(np.dot(z, n))
        if np.linalg.norm(v) < 1e-9:
            R = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
        else:
            vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
            R = np.eye(3) + vx + vx @ vx / (1.0 + c)
        ET.SubElement(parent_el, "geom", name=name, type="plane",
                      size="10 10 0.1", pos=_fmt(n * params[3]),
                      quat=_fmt(_quat_from_R(R)))

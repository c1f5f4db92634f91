"""SDF world parser — maps `dart/utils/sdf/SdfParser`.

Supports the model/link/joint subset of SDF 1.4-1.6 the reference's data
files use: worlds with physics (gravity/dt), models with pose, links with
inertial + box/sphere/cylinder collision geometry, and revolute/prismatic/
ball/fixed/screw/universal joints with axes in the child frame.

SDF pose convention: `<pose>x y z roll pitch yaw</pose>` with fixed-axis
RPY (R = Rz Ry Rx); link poses are in the model frame, joint poses in the
child link frame (matching the skel parser's T_cj role).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models.model import Model, ShapeSpec, State, build_model
from nimblephysics_tpu.ops import spatial
from nimblephysics_tpu.ops.lie import Transform, expm_so3


def _rpy_matrix(rpy):
    r = np.asarray(expm_so3(jnp.asarray([0.0, 0.0, rpy[2]])))
    p = np.asarray(expm_so3(jnp.asarray([0.0, rpy[1], 0.0])))
    y = np.asarray(expm_so3(jnp.asarray([rpy[0], 0.0, 0.0])))
    return r @ p @ y


def _pose(elem) -> Tuple[np.ndarray, np.ndarray]:
    if elem is None or elem.text is None:
        return np.eye(3), np.zeros(3)
    v = np.asarray([float(x) for x in elem.text.split()])
    return _rpy_matrix(v[3:6]), v[:3]


_SDF_JOINTS = {
    "fixed": "weld",
    "revolute": "revolute",
    "prismatic": "prismatic",
    "ball": "ball",
    "screw": "screw",
    "universal": "universal",
}


def _geometry(geom):
    if geom is None:
        return None
    box = geom.find("box")
    if box is not None:
        size = np.asarray([float(x) for x in box.find("size").text.split()])
        return "box", np.asarray([size[0], size[1], size[2], 0.0])
    sph = geom.find("sphere")
    if sph is not None:
        return "sphere", np.asarray([float(sph.find("radius").text), 0, 0, 0])
    cyl = geom.find("cylinder")
    if cyl is not None:
        return "cylinder", np.asarray([
            float(cyl.find("radius").text), float(cyl.find("length").text), 0, 0,
        ])
    return None


def parse_sdf(path: str, dtype=None) -> Tuple[Model, State]:
    tree = ET.parse(path)
    root = tree.getroot()
    world = root.find("world") or root

    dt, gravity = 0.001, np.asarray([0.0, 0.0, -9.81])
    physics = world.find("physics")
    if physics is not None:
        if physics.find("max_step_size") is not None:
            dt = float(physics.find("max_step_size").text)
        g = physics.find("gravity")
        if g is not None:
            gravity = np.asarray([float(x) for x in g.text.split()])

    joints_out = []
    shapes_out = []
    body_index = {}

    for model_el in world.findall("model"):
        mname = model_el.get("name", "model")
        Rm, pm = _pose(model_el.find("pose"))
        is_static = (
            model_el.find("static") is not None
            and model_el.find("static").text.strip().lower() in ("true", "1")
        )

        links = {}
        for link in model_el.findall("link"):
            Rl, pl = _pose(link.find("pose"))
            links[link.get("name")] = dict(
                R=Rm @ Rl, p=Rm @ pl + pm, elem=link
            )

        if is_static:
            for name, l in links.items():
                for col in l["elem"].findall("collision"):
                    parsed = _geometry(col.find("geometry"))
                    if parsed is None:
                        continue
                    kind, params = parsed
                    Rs, ps = _pose(col.find("pose"))
                    Rw, pw = l["R"] @ Rs, l["R"] @ ps + l["p"]
                    shapes_out.append(ShapeSpec(
                        kind=kind, body_index=-1,
                        offset=Transform(jnp.asarray(Rw), jnp.asarray(pw)),
                        params=jnp.asarray(params),
                    ))
            continue

        # joints; links without any parent joint become free-floating roots
        child_of = {}
        joint_elems = model_el.findall("joint")
        for j in joint_elems:
            child_of[j.find("child").text.strip()] = j

        def add_link(lname, parent_idx):
            l = links[lname]
            jelem = child_of.get(lname)
            inert = l["elem"].find("inertial")
            mass, com, moment = 1.0, np.zeros(3), np.eye(3)
            if inert is not None:
                if inert.find("mass") is not None:
                    mass = float(inert.find("mass").text)
                Rc_i, com = _pose(inert.find("pose"))
                iel = inert.find("inertia")
                if iel is not None:
                    def gv(t):
                        e = iel.find(t)
                        return float(e.text) if e is not None else 0.0
                    I_l = np.asarray([
                        [gv("ixx"), gv("ixy"), gv("ixz")],
                        [gv("ixy"), gv("iyy"), gv("iyz")],
                        [gv("ixz"), gv("iyz"), gv("izz")],
                    ])
                    moment = Rc_i @ I_l @ Rc_i.T

            if jelem is None:
                jtype, axes = "free", None
                Rpj, ppj = l["R"], l["p"]
                Rcj, pcj = np.eye(3), np.zeros(3)
                damping, lo_l, hi_l = 0.0, -np.inf, np.inf
                jname = f"{mname}/{lname}_root"
            else:
                jtype = _SDF_JOINTS[jelem.get("type", "revolute")]
                jname = f"{mname}/{jelem.get('name')}"
                parent_name = jelem.find("parent").text.strip()
                Rcj, pcj = _pose(jelem.find("pose"))  # joint in child frame
                if parent_name in ("world",):
                    Rp, pp = np.eye(3), np.zeros(3)
                else:
                    par = links[parent_name]
                    Rp, pp = par["R"], par["p"]
                # T_pj = parent⁻¹ · child_world · T_cj
                Rpc = Rp.T @ l["R"]
                ppc = Rp.T @ (l["p"] - pp)
                Rpj = Rpc @ Rcj
                ppj = Rpc @ pcj + ppc
                ax_el = jelem.find("axis")
                axes, damping, lo_l, hi_l = None, 0.0, -np.inf, np.inf
                if ax_el is not None:
                    xyz = ax_el.find("xyz")
                    if xyz is not None:
                        axes = [np.asarray([float(x) for x in xyz.text.split()])]
                    dyn_el = ax_el.find("dynamics")
                    if dyn_el is not None and dyn_el.find("damping") is not None:
                        damping = float(dyn_el.find("damping").text)
                    lim = ax_el.find("limit")
                    if lim is not None:
                        if lim.find("lower") is not None:
                            lo_l = float(lim.find("lower").text)
                        if lim.find("upper") is not None:
                            hi_l = float(lim.find("upper").text)

            gidx = len(joints_out)
            body_index[f"{mname}/{lname}"] = gidx
            joints_out.append(dict(
                type=jtype, name=jname, body_name=f"{mname}/{lname}",
                parent=parent_idx,
                T_pj=Transform(Rpj, ppj), T_cj=Transform(Rcj, pcj),
                axes=np.asarray(axes) if axes is not None else None,
                mass=mass, com=com, moment=moment,
                damping=damping, q_lower=lo_l, q_upper=hi_l,
            ))

            for col in l["elem"].findall("collision"):
                parsed = _geometry(col.find("geometry"))
                if parsed is None:
                    continue
                kind, params = parsed
                Rs, ps = _pose(col.find("pose"))
                shapes_out.append(ShapeSpec(
                    kind=kind, body_index=gidx,
                    offset=Transform(jnp.asarray(Rs), jnp.asarray(ps)),
                    params=jnp.asarray(params),
                ))

            for j2 in joint_elems:
                if j2.find("parent").text.strip() == lname:
                    add_link(j2.find("child").text.strip(), gidx)

        roots = [n for n in links if n not in child_of]
        for r in roots:
            add_link(r, -1)
        for j in joint_elems:
            if j.find("parent").text.strip() == "world":
                child = j.find("child").text.strip()
                if f"{mname}/{child}" not in body_index:
                    add_link(child, -1)

    model = build_model(
        joints_out, gravity=gravity, dt=dt, shapes=tuple(shapes_out), dtype=dtype
    )
    nq = model.nq
    return model, State(q=jnp.zeros(nq, model.mass.dtype),
                        v=jnp.zeros(nq, model.mass.dtype))

"""OpenSim `.osim` model parser — maps `dart/biomechanics/OpenSimParser`
(6,809 LoC), the bridge to the OpenSim/AddBiomechanics ecosystem.

Supports OpenSimDocument v3 (Version 30000/20302 family: joints nested
inside BodySet bodies): bodies with mass/COM/inertia, WeldJoint, PinJoint,
UniversalJoint, BallJoint, FreeJoint, and the biomech workhorse
CustomJoint (SpatialTransform of 6 TransformAxis driven by Constant /
LinearFunction / SimmSpline / PolynomialFunction / MultiplierFunction of
named coordinates), plus the MarkerSet. Functions become hashable specs
compiled as constants (ops/functions.py); a CustomJoint becomes the
`custom` joint type (ops/joints.py CustomSpec).

Also parses .trc marker trajectory files and .mot coordinate files (the
reference's OpenSimParser::loadTRC / loadMot).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.biomechanics.markers import MarkerSet
from nimblephysics_tpu.models.model import Model, State, build_model
from nimblephysics_tpu.ops.functions import build_spline_spec
from nimblephysics_tpu.ops.lie import Transform, euler_xyz_to_matrix


def _vec(text: Optional[str], n=3) -> np.ndarray:
    if text is None:
        return np.zeros(n)
    return np.asarray([float(x) for x in text.split()])


def _tf_from(loc_el, orient_el) -> Tuple[np.ndarray, np.ndarray]:
    p = _vec(loc_el.text if loc_el is not None else None)
    e = _vec(orient_el.text if orient_el is not None else None)
    R = np.asarray(euler_xyz_to_matrix(jnp.asarray(e)))
    return R, p


def _parse_function(fn_el) -> Optional[tuple]:
    """XML function element -> hashable fn spec."""
    tag = fn_el.tag
    if tag == "function":  # wrapper used by some versions
        for child in fn_el:
            return _parse_function(child)
        return None
    if tag == "Constant":
        return ("constant", float(fn_el.find("value").text))
    if tag == "LinearFunction":
        c = _vec(fn_el.find("coefficients").text, 2)
        return ("linear", float(c[0]), float(c[1]))
    if tag == "PolynomialFunction":
        c = [float(x) for x in fn_el.find("coefficients").text.split()]
        # OpenSim polynomial coefficients are highest-order FIRST
        return ("poly", tuple(reversed(c)))
    if tag == "SimmSpline" or tag == "NaturalCubicSpline":
        xs = [float(v) for v in fn_el.find("x").text.split()]
        ys = [float(v) for v in fn_el.find("y").text.split()]
        return build_spline_spec(xs, ys)
    if tag == "MultiplierFunction":
        inner = None
        scale = 1.0
        for child in fn_el:
            if child.tag == "scale":
                scale = float(child.text)
            elif child.tag == "function" or child.tag in (
                "Constant", "LinearFunction", "SimmSpline",
                "NaturalCubicSpline", "PolynomialFunction",
            ):
                inner = _parse_function(child)
        return ("multiplier", inner, scale)
    return None


def _parse_spatial_transform(st_el, coord_names) -> tuple:
    """SpatialTransform -> CustomSpec (shared between v3 and v4)."""
    entries = []
    for ax_el in st_el.findall("TransformAxis"):
        name = ax_el.get("name", "")
        kind = "rot" if name.startswith("rotation") else "trans"
        axis = tuple(float(x) for x in _vec(ax_el.find("axis").text))
        coord_el = ax_el.find("coordinates")
        coord_name = (
            coord_el.text.strip()
            if coord_el is not None and coord_el.text and coord_el.text.strip()
            else None
        )
        fn_spec = None
        for child in ax_el:
            if child.tag in ("coordinates", "axis"):
                continue
            fn_spec = _parse_function(child)
            if fn_spec is not None:
                break
        if fn_spec is None:
            fn_spec = ("constant", 0.0)
        coord_idx = (
            coord_names.index(coord_name) if coord_name in coord_names else -1
        )
        entries.append((kind, axis, fn_spec, coord_idx))
    return (len(coord_names), tuple(entries))


_SIMPLE_JOINTS = {
    "WeldJoint": ("weld", None),
    "PinJoint": ("revolute", [[0.0, 0.0, 1.0]]),
    "SliderJoint": ("prismatic", [[1.0, 0.0, 0.0]]),
    "BallJoint": ("ball", None),
    "FreeJoint": ("free", None),
    "UniversalJoint": ("universal", [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
}


def _parse_biomech_joint(tag, jelem):
    """Shoulder/spine joint types (reference: OpenSimParser.cpp:5551-5663):
    EllipsoidJoint (radii_x_y_z), ScapulothoracicJoint
    (thoracic_ellipsoid_radii_x_y_z + winging axis), ConstantCurvatureJoint
    (length + neutral_angle_x_z_y → fixed-length constant-curvature rod).
    Returns (jtype, axes rows, static spec, default q) or None."""

    def txt(tag_, n=3, default=None):
        el = jelem.find(tag_)
        return _vec(el.text, n) if el is not None else default

    if tag == "EllipsoidJoint":
        radii = txt("radii_x_y_z", 3, np.ones(3))
        return "ellipsoid", [radii], ("xyz", (1.0, 1.0, 1.0)), None
    if tag == "ScapulothoracicJoint":
        radii = txt("thoracic_ellipsoid_radii_x_y_z", 3, np.ones(3))
        off = txt("scapula_winging_axis_origin", 2, np.zeros(2))
        dir_el = jelem.find("scapula_winging_axis_direction")
        direction = float(dir_el.text) if dir_el is not None else 0.0
        axes = [radii, [off[0], off[1], direction]]
        return "scapulathoracic", axes, ("xyz", (1.0, 1.0, 1.0, 1.0)), None
    if tag == "ConstantCurvatureJoint":
        length_el = jelem.find("length")
        length = float(length_el.text) if length_el is not None else 1.0
        neutral = txt("neutral_angle_x_z_y", 3, np.zeros(3))
        axes = [neutral, [length, 1.0, 0.0]]
        # the reference also sets the joint positions to the neutral angles
        # on load (OpenSimParser.cpp:5657-5660)
        return ("constant_curve_incompressible", axes, ((1.0, 1.0, 1.0),),
                list(neutral))
    return None


def parse_osim(path: str, dtype=None, ignore_joint_types: Tuple[str, ...] = ()
               ) -> Tuple[Model, State, MarkerSet]:
    """Load an OpenSim model (v3 30000-family or v4 40000) ->
    (Model, default State, MarkerSet)."""
    tree = ET.parse(path)
    doc = tree.getroot()
    model_el = doc.find("Model")
    if model_el is None:
        raise ValueError("no <Model> in osim file")
    version = int(doc.get("Version", "30000"))
    if version >= 40000:
        return _parse_osim_v4(model_el, dtype, ignore_joint_types)

    gravity = _vec(
        model_el.find("gravity").text if model_el.find("gravity") is not None
        else "0 -9.80665 0"
    )

    body_set = model_el.find("BodySet").find("objects")
    joints_out: List[dict] = []
    init_q: List[float] = []
    body_index: Dict[str, int] = {}

    for body in body_set.findall("Body"):
        bname = body.get("name")
        if bname == "ground":
            body_index["ground"] = -1
            continue
        mass = float(body.find("mass").text) if body.find("mass") is not None else 1.0
        com = _vec(
            body.find("mass_center").text
            if body.find("mass_center") is not None else None
        )

        def iv(tag):
            el = body.find(tag)
            return float(el.text) if el is not None else 0.0

        moment = np.asarray(
            [
                [iv("inertia_xx"), iv("inertia_xy"), iv("inertia_xz")],
                [iv("inertia_xy"), iv("inertia_yy"), iv("inertia_yz")],
                [iv("inertia_xz"), iv("inertia_yz"), iv("inertia_zz")],
            ]
        )

        joint_wrap = body.find("Joint")
        jelem = None
        if joint_wrap is not None:
            for child in joint_wrap:
                jelem = child
                break
        if jelem is None:
            # no joint: welded to ground at identity
            jtype, spec, axes = "weld", None, None
            Rp, pp = np.eye(3), np.zeros(3)
            Rc, pc = np.eye(3), np.zeros(3)
            parent = -1
            coords_meta = []
            jname = f"{bname}_weld"
        else:
            parent_name = jelem.find("parent_body").text.strip()
            parent = body_index.get(parent_name, -1)
            Rp, pp = _tf_from(
                jelem.find("location_in_parent"),
                jelem.find("orientation_in_parent"),
            )
            Rc, pc = _tf_from(jelem.find("location"), jelem.find("orientation"))
            jname = jelem.get("name", f"{bname}_joint")

            # coordinates declared by this joint
            coords_meta = []
            cs = jelem.find("CoordinateSet")
            if cs is not None and cs.find("objects") is not None:
                for c in cs.find("objects").findall("Coordinate"):
                    rng = _vec(
                        c.find("range").text if c.find("range") is not None
                        else None, 2,
                    )
                    default = (
                        float(c.find("default_value").text)
                        if c.find("default_value") is not None else 0.0
                    )
                    clamped = (
                        c.find("clamped") is not None
                        and c.find("clamped").text.strip().lower() == "true"
                    )
                    coords_meta.append(
                        dict(name=c.get("name"), lo=rng[0], hi=rng[1],
                             default=default, clamped=clamped)
                    )

            tag = jelem.tag
            spec, axes = None, None
            forced_defaults = None
            if tag in ignore_joint_types or tag == "WeldJoint":
                jtype = "weld"
                coords_meta = []
            elif tag == "PinJoint":
                jtype = "revolute"
                axes = [[0.0, 0.0, 1.0]]
            elif tag == "SliderJoint":
                jtype = "prismatic"
                axes = [[1.0, 0.0, 0.0]]
            elif tag == "BallJoint":
                jtype = "ball"
                coords_meta = coords_meta[:3]
            elif tag == "FreeJoint":
                jtype = "free"
                coords_meta = coords_meta[:6]
            elif tag == "UniversalJoint":
                jtype = "universal"
                axes = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
            elif tag == "CustomJoint":
                jtype = "custom"
                spec = _parse_spatial_transform(
                    jelem.find("SpatialTransform"),
                    [c["name"] for c in coords_meta],
                )
            else:
                biome = _parse_biomech_joint(tag, jelem)
                if biome is None:
                    raise ValueError(f"unsupported OpenSim joint {tag!r}")
                jtype, axes, spec, forced_defaults = biome

        nd = spec[0] if jtype == "custom" else JOINT_NDOF_OSIM[jtype]
        lo = [c["lo"] if c.get("clamped") else -np.inf for c in coords_meta]
        hi = [c["hi"] if c.get("clamped") else np.inf for c in coords_meta]
        defaults = [c["default"] for c in coords_meta]
        lo = (lo + [-np.inf] * nd)[:nd]
        hi = (hi + [np.inf] * nd)[:nd]
        defaults = (defaults + [0.0] * nd)[:nd]
        if jelem is not None and forced_defaults is not None:
            defaults = (list(forced_defaults) + [0.0] * nd)[:nd]

        gidx = len(joints_out)
        body_index[bname] = gidx
        joints_out.append(
            dict(
                type=jtype, name=jname, body_name=bname, parent=parent,
                T_pj=Transform(Rp, pp), T_cj=Transform(Rc, pc),
                axes=np.asarray(axes) if axes is not None else None,
                custom_spec=spec,
                mass=mass, com=com, moment=moment,
                q_lower=lo, q_upper=hi,
                dof_names=tuple(c["name"] for c in coords_meta),
            )
        )
        init_q.extend(defaults)

    model = build_model(joints_out, gravity=gravity, dtype=dtype)
    state = State(
        q=jnp.asarray(np.asarray(init_q), dtype=model.mass.dtype),
        v=jnp.zeros(model.nq, dtype=model.mass.dtype),
    )

    # markers
    names, bodies, offsets = [], [], []
    mset = model_el.find("MarkerSet")
    if mset is not None and mset.find("objects") is not None:
        for mk in mset.find("objects").findall("Marker"):
            body_el = mk.find("body")
            if body_el is None:
                body_el = mk.find("socket_parent_frame")
            bname = body_el.text.strip().replace("/bodyset/", "") if body_el is not None else ""
            if bname not in body_index or body_index[bname] < 0:
                continue
            names.append(mk.get("name"))
            bodies.append(body_index[bname])
            offsets.append(_vec(
                mk.find("location").text if mk.find("location") is not None
                else None
            ))
    markers = MarkerSet(
        names=tuple(names),
        body_indices=tuple(bodies),
        offsets=jnp.asarray(np.asarray(offsets).reshape(len(names), 3),
                            dtype=model.mass.dtype),
    )
    return model, state, markers


def load_trc(path: str):
    """TRC marker trajectory file -> (times (T,), labels, points (T, n, 3) in
    meters, mask (T, n))."""
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f]
    header = lines[2].split("\t")
    meta = dict(zip(lines[1].split("\t"), header))
    unit = meta.get("Units", "mm").strip()
    scale = 0.001 if unit.lower().startswith("mm") else 1.0
    labels = [x for x in lines[3].split("\t")[2:] if x.strip()]
    data_rows = []
    for line in lines[5:]:
        if not line.strip():
            continue
        parts = line.split("\t")
        data_rows.append(parts)
    T = len(data_rows)
    n = len(labels)
    times = np.zeros(T)
    pts = np.full((T, n, 3), np.nan)
    for t, parts in enumerate(data_rows):
        times[t] = float(parts[1])
        vals = parts[2:]
        for i in range(n):
            try:
                x, y, z = vals[3 * i: 3 * i + 3]
                if x.strip() and y.strip() and z.strip():
                    pts[t, i] = [float(x), float(y), float(z)]
            except (ValueError, IndexError):
                pass
    mask = ~np.isnan(pts[..., 0])
    return times, labels, pts * scale, mask


def load_mot(path: str):
    """MOT coordinate file -> (column names, data (T, n))."""
    with open(path) as f:
        lines = f.readlines()
    start = 0
    for i, line in enumerate(lines):
        if line.strip().lower() == "endheader":
            start = i + 1
            break
    cols = lines[start].split()
    data = np.asarray(
        [[float(x) for x in l.split()] for l in lines[start + 1:] if l.strip()]
    )
    return cols, data


def _parse_osim_v4(model_el, dtype, ignore_joint_types):
    """OpenSim 4.x: BodySet holds plain bodies; JointSet holds joints whose
    parent/child are PhysicalOffsetFrames (socket paths like
    /bodyset/<name> or /ground)."""
    gravity = _vec(
        model_el.find("gravity").text
        if model_el.find("gravity") is not None else "0 -9.80665 0"
    )

    body_data = {}
    for body in model_el.find("BodySet").find("objects").findall("Body"):
        name = body.get("name")
        mass = (
            float(body.find("mass").text) if body.find("mass") is not None else 1.0
        )
        com = _vec(
            body.find("mass_center").text
            if body.find("mass_center") is not None else None
        )
        inertia_el = body.find("inertia")
        if inertia_el is not None:
            v = _vec(inertia_el.text, 6)
            moment = np.asarray([
                [v[0], v[3], v[4]],
                [v[3], v[1], v[5]],
                [v[4], v[5], v[2]],
            ])
        else:
            moment = np.eye(3)
        body_data[name] = dict(mass=mass, com=com, moment=moment)

    def frame_info(joint_el, socket_tag):
        """Resolve a socket frame -> (body name or 'ground', R, p)."""
        ref = joint_el.find(socket_tag).text.strip()
        frame_name = ref.split("/")[-1]
        frames = joint_el.find("frames")
        if frames is not None:
            for fr in frames:
                if fr.get("name") == frame_name:
                    parent_path = fr.find("socket_parent").text.strip()
                    bname = parent_path.split("/")[-1]
                    p = _vec(
                        fr.find("translation").text
                        if fr.find("translation") is not None else None
                    )
                    e = _vec(
                        fr.find("orientation").text
                        if fr.find("orientation") is not None else None
                    )
                    R = np.asarray(euler_xyz_to_matrix(jnp.asarray(e)))
                    return bname, R, p
        # direct body/ground reference without an offset frame
        return frame_name, np.eye(3), np.zeros(3)

    joints_out = []
    init_q = []
    body_index = {"ground": -1}
    pending = list(model_el.find("JointSet").find("objects"))

    # topological insertion: process joints whose parent body is known
    progress = True
    while pending and progress:
        progress = False
        remaining = []
        for jelem in pending:
            parent_body, Rp, pp = frame_info(jelem, "socket_parent_frame")
            child_body, Rc, pc = frame_info(jelem, "socket_child_frame")
            if parent_body not in body_index:
                remaining.append(jelem)
                continue
            progress = True
            tag = jelem.tag
            jname = jelem.get("name", child_body + "_joint")

            coords_meta = []
            co = jelem.find("coordinates")
            if co is not None:
                for c in co.findall("Coordinate"):
                    rng = _vec(
                        c.find("range").text
                        if c.find("range") is not None else None, 2,
                    )
                    coords_meta.append(dict(
                        name=c.get("name"),
                        lo=rng[0], hi=rng[1],
                        default=(
                            float(c.find("default_value").text)
                            if c.find("default_value") is not None else 0.0
                        ),
                        clamped=(
                            c.find("clamped") is not None
                            and c.find("clamped").text.strip().lower() == "true"
                        ),
                    ))

            spec, axes = None, None
            forced_defaults = None
            if tag in ignore_joint_types or tag == "WeldJoint":
                jtype = "weld"
                coords_meta = []
            elif tag == "CustomJoint":
                jtype = "custom"
                spec = _parse_spatial_transform(
                    jelem.find("SpatialTransform"),
                    [c["name"] for c in coords_meta],
                )
            elif tag in _SIMPLE_JOINTS:
                jtype, axes = _SIMPLE_JOINTS[tag]
            else:
                biome = _parse_biomech_joint(tag, jelem)
                if biome is None:
                    raise ValueError(f"unsupported OpenSim joint {tag!r}")
                jtype, axes, spec, forced_defaults = biome

            nd = spec[0] if jtype == "custom" else JOINT_NDOF_OSIM[jtype]
            lo = [c["lo"] if c.get("clamped") else -np.inf for c in coords_meta]
            hi = [c["hi"] if c.get("clamped") else np.inf for c in coords_meta]
            defaults = [c["default"] for c in coords_meta]
            if forced_defaults is not None:
                defaults = list(forced_defaults)
            lo = (lo + [-np.inf] * nd)[:nd]
            hi = (hi + [np.inf] * nd)[:nd]
            defaults = (defaults + [0.0] * nd)[:nd]

            bd = body_data.get(child_body, dict(mass=1.0, com=np.zeros(3),
                                                moment=np.eye(3)))
            gidx = len(joints_out)
            body_index[child_body] = gidx
            joints_out.append(dict(
                type=jtype, name=jname, body_name=child_body,
                parent=body_index[parent_body],
                T_pj=Transform(Rp, pp), T_cj=Transform(Rc, pc),
                axes=np.asarray(axes) if axes is not None else None,
                custom_spec=spec,
                mass=bd["mass"], com=bd["com"], moment=bd["moment"],
                q_lower=lo, q_upper=hi,
                dof_names=tuple(c["name"] for c in coords_meta),
            ))
            init_q.extend(defaults)
        pending = remaining

    if pending:
        raise ValueError(
            f"could not resolve joint parents for {[j.get('name') for j in pending]}"
        )

    model = build_model(joints_out, gravity=gravity, dtype=dtype)
    state = State(
        q=jnp.asarray(np.asarray(init_q), dtype=model.mass.dtype),
        v=jnp.zeros(model.nq, dtype=model.mass.dtype),
    )

    names, bodies, offsets = [], [], []
    mset = model_el.find("MarkerSet")
    if mset is not None and mset.find("objects") is not None:
        for mk in mset.find("objects").findall("Marker"):
            sp = mk.find("socket_parent_frame")
            if sp is None or sp.text is None:
                continue
            bname = sp.text.strip().split("/")[-1]
            if bname not in body_index or body_index[bname] < 0:
                continue
            names.append(mk.get("name"))
            bodies.append(body_index[bname])
            offsets.append(_vec(
                mk.find("location").text
                if mk.find("location") is not None else None
            ))
    markers = MarkerSet(
        names=tuple(names),
        body_indices=tuple(bodies),
        offsets=jnp.asarray(
            np.asarray(offsets).reshape(len(names), 3), dtype=model.mass.dtype
        ),
    )
    return model, state, markers


JOINT_NDOF_OSIM = {
    "weld": 0, "revolute": 1, "prismatic": 1, "universal": 2,
    "ball": 3, "free": 6,
    "ellipsoid": 3, "scapulathoracic": 4,
    "constant_curve": 4, "constant_curve_incompressible": 3,
}

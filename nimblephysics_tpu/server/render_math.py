"""Python mirror of the web viewer's software-3D renderer math.

The image this framework builds on has no JavaScript engine, so the
canvas renderer in `server/web_gui/index.html` cannot be executed by a
browser test (documented in scripts/check_viewer.py). This module keeps
the SAME formulas — camera basis, perspective projection, XYZ-Euler
rotation, box face tables, Lambert shading, back-face culling, painter
sort — in Python so they CAN be tested with table-driven goldens
(tests/test_viewer_render_math.py), and that test additionally pins the
literal formula strings inside index.html so the two cannot drift apart
silently.

Reference analogue: the three.js scene construction of
/root/reference/javascript/src/NimbleStandalone.ts:1 (there the camera/
projection math lives in three.js; here it is ~40 lines of explicit
arithmetic, mirrored for testability).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

Vec3 = Tuple[float, float, float]

LIGHT_DIR = (0.4, 0.8, 0.3)


def _norm3(a: Sequence[float]) -> Vec3:
    l = math.hypot(a[0], a[1], a[2]) or 1.0
    return (a[0] / l, a[1] / l, a[2] / l)


def _sub3(a, b) -> Vec3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add3(a, b) -> Vec3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _dot3(a, b) -> float:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b) -> Vec3:
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def cam_basis(yaw: float, pitch: float, dist: float, target: Vec3) -> Dict:
    """index.html `camBasis()`: orbit camera eye + (right, up, forward)."""
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    eye = (target[0] + dist * cp * sy,
           target[1] + dist * sp,
           target[2] + dist * cp * cy)
    f = _norm3(_sub3(target, eye))
    r = _norm3(_cross3(f, (0.0, 1.0, 0.0)))
    u = _cross3(r, f)
    return {"eye": eye, "f": f, "r": r, "u": u}


def project(p: Vec3, basis: Dict, width: int, height: int,
            fov_deg: float = 60.0) -> Optional[Dict]:
    """index.html `project()`: perspective projection to canvas pixels.
    Returns None behind the near plane (z < 0.02)."""
    d = _sub3(p, basis["eye"])
    x = _dot3(d, basis["r"])
    y = _dot3(d, basis["u"])
    z = _dot3(d, basis["f"])
    if z < 0.02:
        return None
    s = (height / 2) / math.tan(fov_deg * math.pi / 360)
    return {"x": width / 2 + x / z * s, "y": height / 2 - y / z * s,
            "z": z, "s": s / z}


def euler_to_r(e: Sequence[float]) -> List[List[float]]:
    """index.html `eulerToR()`: XYZ-order rotation matrix (protocol
    convention; matches math::eulerXYZToMatrix,
    /root/reference/dart/math/Geometry.hpp:132)."""
    a, b, c = e
    ca, sa = math.cos(a), math.sin(a)
    cb, sb = math.cos(b), math.sin(b)
    cc, sc = math.cos(c), math.sin(c)
    return [
        [cb * cc, -cb * sc, sb],
        [sa * sb * cc + ca * sc, -sa * sb * sc + ca * cc, -sa * cb],
        [-ca * sb * cc + sa * sc, ca * sb * sc + sa * cc, ca * cb],
    ]


def apply_r(R, v) -> Vec3:
    return (_dot3(R[0], v), _dot3(R[1], v), _dot3(R[2], v))


def box_faces(size: Sequence[float]):
    """index.html `boxFaces()`: 8 corners + 6 quads (outward winding)."""
    hx, hy, hz = size[0] / 2, size[1] / 2, size[2] / 2
    v = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                v.append((sx * hx, sy * hy, sz * hz))
    f = [[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
         [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]]
    return v, f


def shade(n: Vec3) -> float:
    """index.html face shading: 0.45 + 0.55 * max(0, n . LIGHT)."""
    return 0.45 + 0.55 * max(0.0, _dot3(n, _norm3(LIGHT_DIR)))


def box_polygons(size, pos, euler, yaw, pitch, dist, target,
                 width=800, height=600, fov_deg=60.0):
    """The full drawScene box path: transform -> project -> back-face
    cull -> per-face shade/depth, painter-sorted far-to-near. Returns a
    list of dicts {pts: [(x,y)..], depth, shade, face} in DRAW ORDER."""
    basis = cam_basis(yaw, pitch, dist, target)
    R = euler_to_r(euler)
    verts, faces = box_faces(size)
    wv = [_add3(apply_r(R, v), pos) for v in verts]
    pv = [project(p, basis, width, height, fov_deg) for p in wv]
    prims = []
    for fi, f in enumerate(faces):
        if any(pv[i] is None for i in f):
            continue
        a, b, c = wv[f[0]], wv[f[1]], wv[f[2]]
        n = _norm3(_cross3(_sub3(b, a), _sub3(c, a)))
        if _dot3(n, _sub3(basis["eye"], a)) <= 0:
            continue  # back-face cull
        depth = sum(pv[i]["z"] for i in f) / len(f)
        prims.append({
            "pts": [(pv[i]["x"], pv[i]["y"]) for i in f],
            "depth": depth,
            "shade": shade(n),
            "face": fi,
        })
    prims.sort(key=lambda p: -p["depth"])
    return prims


# Literal substrings of index.html that must match this module's math —
# the drift tripwire tests/test_viewer_render_math.py asserts on.
HTML_FORMULA_PINS = (
    "const s = (H / 2) / Math.tan(cam.fov * Math.PI / 360);",
    "return { x: W / 2 + x / z * s, y: H / 2 - y / z * s, z, s: s / z };",
    "cam.target[0] + cam.dist * cp * sy,",
    "cam.target[1] + cam.dist * sp,",
    "cam.target[2] + cam.dist * cp * cy,",
    "[cb*cc, -cb*sc, sb],",
    "[sa*sb*cc + ca*sc, -sa*sb*sc + ca*cc, -sa*cb],",
    "[-ca*sb*cc + sa*sc, ca*sb*sc + sa*cc, ca*cb],",
    "0.45 + 0.55 * Math.max(0, dot3(n, LIGHT))",
    "if (dot3(n, sub3(B.eye, a)) <= 0) continue;",
    "prims.sort((a, b) => b.depth - a.depth);",
    "const f = [[0,1,3,2],[4,6,7,5],[0,4,5,1],[2,3,7,6],[0,2,6,4],[1,5,7,3]];",
    "if (z < 0.02) return null;",
    "const LIGHT = norm3([0.4, 0.8, 0.3]);",
)

"""Mesh loading + convex-hull collision geometry.

The reference loads meshes through assimp (`dart/dynamics/MeshShape`,
`dart/utils/` loaders) and collides convex meshes via libccd GJK/MPR
(`dart/collision/dart/DARTCollide.hpp:42,295`). assimp is not in this
image and pivoting GJK is hostile to XLA, so the TPU design instead:

  * loads OBJ / STL (ascii + binary) host-side with zero dependencies,
  * reduces the mesh to a CONVEX HULL decimated to at most `max_vertices`
    (greedy farthest-point selection, re-hulled), giving every mesh shape
    a small fixed-size vertex/face table,
  * collides hulls with fixed-shape differentiable vertex-vs-hull and
    support-projection tests in `ops/collide.py`.

Decimation bounds compile size: contact math is (V_a x F_b) tensor ops.
"""

from __future__ import annotations

import os
import struct

import numpy as np

__all__ = ["load_mesh_vertices", "convex_hull_data", "load_collision_hull"]


def load_mesh_vertices(path: str) -> np.ndarray:
    """Vertices (V,3) from an .obj or .stl file (no faces needed — we hull)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return _load_obj(path)
    if ext == ".stl":
        return _load_stl(path)
    raise ValueError(f"unsupported mesh format {ext!r} (obj/stl supported)")


def _load_obj(path: str) -> np.ndarray:
    verts = []
    with open(path, errors="ignore") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    if not verts:
        raise ValueError(f"no vertices in {path}")
    return np.asarray(verts)


def _load_stl(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        if head == b"solid":
            # could still be binary with a 'solid' header; try ascii first
            try:
                return _load_stl_ascii(path)
            except ValueError:
                pass
        data = f.read()
    # binary: 80-byte header, uint32 tri count, 50 bytes per tri
    n = struct.unpack("<I", data[80:84])[0]
    verts = np.frombuffer(
        data[84: 84 + n * 50], dtype=np.uint8
    ).reshape(n, 50)[:, 12:48].copy().view(np.float32).reshape(n, 3, 3)
    return verts.reshape(-1, 3).astype(np.float64)


def _load_stl_ascii(path: str) -> np.ndarray:
    verts = []
    with open(path, errors="ignore") as f:
        for line in f:
            s = line.split()
            if len(s) == 4 and s[0] == "vertex":
                verts.append([float(s[1]), float(s[2]), float(s[3])])
    if not verts:
        raise ValueError("not ascii stl")
    return np.asarray(verts)


def convex_hull_data(points: np.ndarray, max_vertices: int = 24):
    """(vertices (V,3), faces (F,4)) of the convex hull of `points`,
    decimated to <= max_vertices by greedy farthest-point selection.
    Faces use scipy's half-space layout: n·x + d <= 0 inside."""
    from scipy.spatial import ConvexHull

    pts = np.asarray(points, dtype=np.float64)
    pts = pts[np.isfinite(pts).all(axis=1)]
    if pts.shape[0] < 4 or np.linalg.matrix_rank(pts - pts.mean(0)) < 3:
        raise ValueError("mesh is degenerate (needs >= 4 non-coplanar points)")
    hull = ConvexHull(pts)
    v = pts[hull.vertices]
    if v.shape[0] > max_vertices:
        # farthest-point decimation keeps the extremal shape
        chosen = [int(np.argmax(np.linalg.norm(v - v.mean(0), axis=1)))]
        for _ in range(max_vertices - 1):
            d = np.min(
                np.linalg.norm(v[:, None] - v[chosen][None], axis=-1), axis=1
            )
            chosen.append(int(np.argmax(d)))
        sub = v[sorted(set(chosen))]
        hull = ConvexHull(sub)
        v = sub[hull.vertices]
        hull = ConvexHull(v)
    faces = np.unique(np.round(hull.equations, 12), axis=0)
    return v, faces


def load_collision_hull(path: str, scale=1.0, max_vertices: int = 24):
    """Convenience: mesh file -> (vertices, faces) hull arrays, scaled."""
    verts = load_mesh_vertices(path) * np.asarray(scale)
    return convex_hull_data(verts, max_vertices=max_vertices)

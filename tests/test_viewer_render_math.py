"""Table-driven goldens for the web viewer's renderer math (round-5
verdict #8): the image has no JS engine, so the canvas renderer's
projection/painter/shading formulas are mirrored in
`server/render_math.py` and tested HERE, and the mirror is pinned to the
literal formula strings in index.html so the two cannot drift apart.
Reference: /root/reference/javascript/src/NimbleStandalone.ts:1 (the
three.js viewer whose role this renderer fills)."""

import math
import os

import numpy as np

from nimblephysics_tpu.server import render_math as rm

HTML = os.path.join(os.path.dirname(rm.__file__), "web_gui", "index.html")


def test_html_formulas_pinned():
    """Every formula the Python mirror implements must appear VERBATIM in
    index.html — editing the JS math without updating the mirror (or vice
    versa) fails here."""
    with open(HTML) as f:
        src = f.read()
    for pin in rm.HTML_FORMULA_PINS:
        assert pin in src, f"index.html lost pinned formula: {pin!r}"


def test_project_straight_down_z():
    """Camera at yaw=0, pitch=0, dist=4 looking at the origin sits at
    (0, 0, 4) looking along -z. A point at the target projects to the
    canvas center with z = dist; a point 1 m right of target lands
    s/dist pixels right of center."""
    W, H, fov = 800, 600, 60.0
    B = rm.cam_basis(0.0, 0.0, 4.0, (0.0, 0.0, 0.0))
    np.testing.assert_allclose(B["eye"], (0, 0, 4), atol=1e-12)
    p0 = rm.project((0, 0, 0), B, W, H, fov)
    assert p0 is not None
    np.testing.assert_allclose((p0["x"], p0["y"]), (400, 300), atol=1e-9)
    np.testing.assert_allclose(p0["z"], 4.0, atol=1e-12)
    s = (H / 2) / math.tan(math.radians(fov) / 2)
    # right = f x (0,1,0) with f = (0,0,-1) -> right = (+1, 0, 0)
    p1 = rm.project((1.0, 0, 0), B, W, H, fov)
    np.testing.assert_allclose(p1["x"], 400 + s / 4.0, atol=1e-9)
    np.testing.assert_allclose(p1["y"], 300, atol=1e-9)
    # a point 1 m above the target rises on the canvas (y decreases)
    p2 = rm.project((0, 1.0, 0), B, W, H, fov)
    np.testing.assert_allclose(p2["y"], 300 - s / 4.0, atol=1e-9)
    # behind the near plane: culled
    assert rm.project((0, 0, 4.01), B, W, H, fov) is None


def test_euler_to_r_golden():
    """XYZ-Euler: 90° about each single axis against hand values."""
    R = rm.euler_to_r((math.pi / 2, 0, 0))     # about x
    np.testing.assert_allclose(
        R, [[1, 0, 0], [0, 0, -1], [0, 1, 0]], atol=1e-12)
    R = rm.euler_to_r((0, math.pi / 2, 0))     # about y
    np.testing.assert_allclose(
        R, [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], atol=1e-12)
    R = rm.euler_to_r((0, 0, math.pi / 2))     # about z
    np.testing.assert_allclose(
        R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-12)
    # composition order: R = Rx(a) @ Ry(b) @ Rz(c)
    a, b, c = 0.3, -0.7, 1.1
    def rx(t): return np.array([[1, 0, 0], [0, math.cos(t), -math.sin(t)],
                                [0, math.sin(t), math.cos(t)]])
    def ry(t): return np.array([[math.cos(t), 0, math.sin(t)], [0, 1, 0],
                                [-math.sin(t), 0, math.cos(t)]])
    def rz(t): return np.array([[math.cos(t), -math.sin(t), 0],
                                [math.sin(t), math.cos(t), 0], [0, 0, 1]])
    np.testing.assert_allclose(rm.euler_to_r((a, b, c)),
                               rx(a) @ ry(b) @ rz(c), atol=1e-12)


def test_box_polygons_axis_aligned_golden():
    """Unit box at the origin seen head-on from (0,0,4): exactly ONE
    visible face survives culling (the +z face; the four side faces are
    edge-on with n ⊥ view — culled by the <= 0 rule), projected as the
    square of hand-computed pixel size, with hand-computed Lambert
    shade."""
    W, H, fov = 800, 600, 60.0
    prims = rm.box_polygons((1, 1, 1), (0, 0, 0), (0, 0, 0),
                            yaw=0.0, pitch=0.0, dist=4.0,
                            target=(0, 0, 0), width=W, height=H,
                            fov_deg=fov)
    assert len(prims) == 1, [p["face"] for p in prims]
    front = prims[0]
    # boxFaces vertex order: index = 4*(sx>0) + 2*(sy>0) + (sz>0), so the
    # +z face {1,5,7,3} is table entry 5
    assert front["face"] == 5
    # half-size in pixels at depth z = 4 - 0.5 = 3.5
    s = (H / 2) / math.tan(math.radians(fov) / 2)
    half_px = 0.5 / 3.5 * s
    xs = sorted(set(round(x, 6) for x, _ in front["pts"]))
    ys = sorted(set(round(y, 6) for _, y in front["pts"]))
    np.testing.assert_allclose(xs, [400 - half_px, 400 + half_px],
                               atol=1e-6)
    np.testing.assert_allclose(ys, [300 - half_px, 300 + half_px],
                               atol=1e-6)
    np.testing.assert_allclose(front["depth"], 3.5, atol=1e-12)
    # shade of the n = (0,0,1) face: 0.45 + 0.55 * (LIGHT_z / |LIGHT|)
    ln = np.asarray(rm.LIGHT_DIR) / np.linalg.norm(rm.LIGHT_DIR)
    np.testing.assert_allclose(front["shade"], 0.45 + 0.55 * ln[2],
                               atol=1e-12)


def test_box_polygons_oblique_painter_order():
    """From an oblique orbit three faces are visible, painter-sorted
    far-to-near (depths strictly decreasing), and a second box farther
    from the camera draws before a nearer one."""
    prims = rm.box_polygons((1, 1, 1), (0, 0, 0), (0.2, 0.3, 0.1),
                            yaw=0.7, pitch=0.4, dist=5.0,
                            target=(0, 0.2, 0))
    assert len(prims) == 3
    depths = [p["depth"] for p in prims]
    assert depths == sorted(depths, reverse=True)
    # culled + visible partition the 6 faces
    assert len({p["face"] for p in prims}) == 3
    # shades are within the renderer's [0.45, 1.0] band
    for p in prims:
        assert 0.45 - 1e-12 <= p["shade"] <= 1.0 + 1e-12

"""Retained-mode GUI scene — `GUIStateMachine` (GUIStateMachine.hpp:59-400).

The reference mutates a retained scene via commands (create box/sphere/
line/mesh, set position/rotation/color, UI text/buttons/plots) serialized
to the three.js viewer. This implementation keeps the same retained-object
model and command vocabulary but serializes a documented JSON protocol
(one list of command dicts per flush):

    {"type": "create_box",  "key": k, "size": [..], "pos": [..],
     "euler": [..], "color": [..], "layer": l}
    {"type": "create_sphere", "key": k, "radius": r, ...}
    {"type": "create_capsule", "key": k, "radius": r, "height": h, ...}
    {"type": "create_line", "key": k, "points": [[..],..], "color": [..]}
    {"type": "create_text", "key": k, "contents": s, "pos": [..], ...}
    {"type": "set_object_position", "key": k, "pos": [..]}
    {"type": "set_object_rotation", "key": k, "euler": [..]}
    {"type": "set_object_color", "key": k, "color": [..]}
    {"type": "delete_object", "key": k}
    {"type": "timestep", "time": t}
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.ops import dynamics as dyn
from nimblephysics_tpu.ops.lie import matrix_to_euler_xyz


class GUIStateMachine:
    def __init__(self):
        self.objects: Dict[str, dict] = {}
        self._queue: List[dict] = []

    # -- low-level command API (create*/set* — GUIStateMachine.hpp:143-266) --
    def _create(self, cmd: dict) -> None:
        self.objects[cmd["key"]] = cmd
        self._queue.append(cmd)

    def create_box(self, key, size, pos=(0, 0, 0), euler=(0, 0, 0),
                   color=(0.5, 0.5, 0.5, 1.0), layer=""):
        self._create({"type": "create_box", "key": key,
                      "size": list(map(float, size)),
                      "pos": list(map(float, pos)),
                      "euler": list(map(float, euler)),
                      "color": list(map(float, color)), "layer": layer})

    def create_sphere(self, key, radius, pos=(0, 0, 0),
                      color=(0.5, 0.5, 0.5, 1.0), layer=""):
        self._create({"type": "create_sphere", "key": key,
                      "radius": float(radius), "pos": list(map(float, pos)),
                      "color": list(map(float, color)), "layer": layer})

    def create_capsule(self, key, radius, height, pos=(0, 0, 0),
                       euler=(0, 0, 0), color=(0.5, 0.5, 0.5, 1.0), layer=""):
        self._create({"type": "create_capsule", "key": key,
                      "radius": float(radius), "height": float(height),
                      "pos": list(map(float, pos)),
                      "euler": list(map(float, euler)),
                      "color": list(map(float, color)), "layer": layer})

    def create_line(self, key, points, color=(1.0, 0.0, 0.0, 1.0), layer=""):
        self._create({"type": "create_line", "key": key,
                      "points": [list(map(float, p)) for p in points],
                      "color": list(map(float, color)), "layer": layer})

    def create_text(self, key, contents, pos=(0, 0), size=(200, 50)):
        self._create({"type": "create_text", "key": key, "contents": contents,
                      "pos": list(map(float, pos)),
                      "size": list(map(float, size))})

    def set_object_position(self, key, pos):
        self._queue.append({"type": "set_object_position", "key": key,
                            "pos": list(map(float, pos))})
        if key in self.objects:
            self.objects[key]["pos"] = list(map(float, pos))

    def set_object_rotation(self, key, euler):
        self._queue.append({"type": "set_object_rotation", "key": key,
                            "euler": list(map(float, euler))})
        if key in self.objects:
            self.objects[key]["euler"] = list(map(float, euler))

    def set_object_color(self, key, color):
        self._queue.append({"type": "set_object_color", "key": key,
                            "color": list(map(float, color))})

    def delete_object(self, key):
        self.objects.pop(key, None)
        self._queue.append({"type": "delete_object", "key": key})

    # -- meshes (create_mesh, GUIStateMachine.hpp:176-214) -------------------
    def create_mesh(self, key, vertices, faces=None, pos=(0, 0, 0),
                    euler=(0, 0, 0), color=(0.6, 0.6, 0.8, 1.0), layer=""):
        """Triangle mesh (or point hull if faces omitted — the viewer
        convex-hulls the vertices)."""
        self._create({
            "type": "create_mesh", "key": key,
            "vertices": [list(map(float, v)) for v in np.asarray(vertices)],
            "faces": ([list(map(int, f)) for f in faces]
                      if faces is not None else None),
            "pos": list(map(float, pos)), "euler": list(map(float, euler)),
            "color": list(map(float, color)), "layer": layer,
        })

    # -- layers (createLayer/setLayerVisible) --------------------------------
    def create_layer(self, key, color=(1.0, 1.0, 1.0, 1.0), default_show=True):
        self._queue.append({"type": "create_layer", "key": key,
                            "color": list(map(float, color)),
                            "show": bool(default_show)})

    def set_layer_visible(self, key, visible: bool):
        self._queue.append({"type": "set_layer_visible", "key": key,
                            "visible": bool(visible)})

    # -- UI widgets (text/button/slider/plot — GUIStateMachine.hpp:329-400) --
    def create_button(self, key, label, pos=(0, 0), size=(120, 40)):
        self._create({"type": "create_button", "key": key, "label": label,
                      "pos": list(map(float, pos)),
                      "size": list(map(float, size))})

    def create_slider(self, key, pos=(0, 0), size=(200, 40), lo=0.0, hi=1.0,
                      value=0.5, only_ints=False, horizontal=True):
        self._create({"type": "create_slider", "key": key,
                      "pos": list(map(float, pos)),
                      "size": list(map(float, size)),
                      "min": float(lo), "max": float(hi),
                      "value": float(value), "only_ints": bool(only_ints),
                      "horizontal": bool(horizontal)})

    def set_slider_value(self, key, value):
        self._queue.append({"type": "set_slider_value", "key": key,
                            "value": float(value)})
        if key in self.objects:
            self.objects[key]["value"] = float(value)

    def create_plot(self, key, pos=(0, 0), size=(300, 200),
                    min_x=0.0, max_x=1.0, min_y=0.0, max_y=1.0,
                    xs=(), ys=(), plot_type="line"):
        self._create({"type": "create_plot", "key": key,
                      "pos": list(map(float, pos)),
                      "size": list(map(float, size)),
                      "min_x": float(min_x), "max_x": float(max_x),
                      "min_y": float(min_y), "max_y": float(max_y),
                      "xs": list(map(float, xs)), "ys": list(map(float, ys)),
                      "plot_type": plot_type})

    def set_plot_data(self, key, xs, ys, min_x=None, max_x=None,
                      min_y=None, max_y=None):
        cmd = {"type": "set_plot_data", "key": key,
               "xs": list(map(float, xs)), "ys": list(map(float, ys))}
        for name, v in (("min_x", min_x), ("max_x", max_x),
                        ("min_y", min_y), ("max_y", max_y)):
            if v is not None:
                cmd[name] = float(v)
        self._queue.append(cmd)
        if key in self.objects:
            self.objects[key].update(cmd)

    def create_rich_plot(self, key, pos=(0, 0), size=(400, 250),
                         min_x=0.0, max_x=1.0, min_y=0.0, max_y=1.0,
                         title="", x_axis_label="", y_axis_label=""):
        self._create({"type": "create_rich_plot", "key": key,
                      "pos": list(map(float, pos)),
                      "size": list(map(float, size)),
                      "min_x": float(min_x), "max_x": float(max_x),
                      "min_y": float(min_y), "max_y": float(max_y),
                      "title": title, "x_axis_label": x_axis_label,
                      "y_axis_label": y_axis_label, "data": {}})

    def set_rich_plot_data(self, key, name, xs, ys,
                           color="blue", plot_type="line"):
        cmd = {"type": "set_rich_plot_data", "key": key, "name": name,
               "xs": list(map(float, xs)), "ys": list(map(float, ys)),
               "color": color, "plot_type": plot_type}
        self._queue.append(cmd)
        if key in self.objects:
            self.objects[key]["data"][name] = cmd

    # -- interaction (setObjectDragEnabled, GUIStateMachine.hpp) -------------
    def set_object_draggable(self, key, draggable: bool = True):
        self._queue.append({"type": "set_object_draggable", "key": key,
                            "draggable": bool(draggable)})
        if key in self.objects:
            self.objects[key]["draggable"] = bool(draggable)

    def set_object_tooltip(self, key, tooltip: str):
        self._queue.append({"type": "set_object_tooltip", "key": key,
                            "tooltip": tooltip})

    # -- world rendering (renderWorld/renderSkeleton, :59-84) ----------------
    def render_world(self, model: Model, state: State, prefix: str = "world"):
        """Create/update one object per collision shape + per-body frame
        markers for shapeless bodies."""
        kin = dyn.forward_kinematics(model, state.q)
        T_wb = [(np.asarray(t.R), np.asarray(t.p)) for t in kin.T_wb]
        for i, shape in enumerate(model.shapes):
            key = f"{prefix}_shape_{i}"
            if shape.body_index < 0:
                Rw = np.asarray(shape.offset.R)
                pw = np.asarray(shape.offset.p)
            else:
                Rb, pb = T_wb[shape.body_index]
                Rw = Rb @ np.asarray(shape.offset.R)
                pw = Rb @ np.asarray(shape.offset.p) + pb
            import jax.numpy as jnp

            euler = np.asarray(matrix_to_euler_xyz(jnp.asarray(Rw)))
            params = np.asarray(shape.params)
            if key not in self.objects:
                if shape.kind == "box":
                    self.create_box(key, params[:3], pw, euler)
                elif shape.kind == "sphere":
                    self.create_sphere(key, params[0], pw)
                elif shape.kind in ("capsule", "cylinder", "cone"):
                    self.create_capsule(key, params[0], params[1], pw, euler)
                elif shape.kind == "halfspace":
                    n = params[:3]
                    self.create_box(
                        key, (10.0, 0.01, 10.0),
                        np.asarray(n) * params[3], (0, 0, 0),
                        color=(0.6, 0.6, 0.6, 1.0),
                    )
                elif shape.kind == "convex":
                    self.create_mesh(key, np.asarray(shape.vertices),
                                     pos=pw, euler=euler)
                elif shape.kind == "heightmap":
                    hm = np.asarray(shape.vertices)
                    H, W = hm.shape
                    x0, z0, dx, dz = [float(v) for v in params[:4]]
                    verts = [
                        [x0 + j * dx, float(hm[i, j]), z0 + i * dz]
                        for i in range(H) for j in range(W)
                    ]
                    faces = []
                    for i in range(H - 1):
                        for j in range(W - 1):
                            a = i * W + j
                            faces.append([a, a + 1, a + W])
                            faces.append([a + 1, a + W + 1, a + W])
                    self.create_mesh(key, verts, faces=faces, pos=pw,
                                     euler=euler, color=(0.5, 0.7, 0.5, 1.0))
            else:
                self.set_object_position(key, pw)
                if shape.kind in ("box", "capsule", "convex"):
                    self.set_object_rotation(key, euler)

    # -- flushing ------------------------------------------------------------
    def flush_json(self) -> str:
        """Drain queued commands as one JSON array (a websocket frame)."""
        out = json.dumps(self._queue)
        self._queue = []
        return out

    def full_state_json(self) -> str:
        """Everything needed to (re)build the scene for a new client."""
        return json.dumps(list(self.objects.values()))


class GUIRecording:
    """Frame recorder for offline replay (`GUIRecording`): one JSON command
    list per frame; `write` saves newline-delimited JSON."""

    def __init__(self):
        self.frames: List[str] = []

    def record_frame(self, gui: GUIStateMachine) -> None:
        self.frames.append(gui.flush_json())

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            f.write("\n".join(self.frames))

    @staticmethod
    def read(path: str) -> List[list]:
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def write_standalone_html(self, path: str, fps: float = 50.0) -> None:
        """Self-contained replay page (the `NimbleStandalone` role): the
        recorded frames are embedded in the viewer html and played back on
        a timer — share a single file to show a simulation."""
        import os

        viewer = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "web_gui", "index.html"
        )
        with open(viewer) as f:
            html = f.read()
        frames_js = (
            "const RECORDED_FRAMES = ["
            + ",".join(self.frames)
            + f"];\nconst RECORDED_FPS = {fps};\n"
            + """
let __frame = 0;
setInterval(() => {
  if (__frame < RECORDED_FRAMES.length) {
    RECORDED_FRAMES[__frame].forEach(handle);
    __frame++;
  } else { __frame = 0; }
}, 1000.0 / RECORDED_FPS);
"""
        )
        # replace the websocket hookup with the embedded playback loop
        # (the page's `send` already guards on a null/closed socket)
        assert "connect();" in html, "viewer page lost its connect() hook"
        html = html.replace(
            "connect();",
            frames_js + "/* standalone replay: no websocket */",
        )
        with open(path, "w") as f:
            f.write(html)

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
                elif shape.kind == "capsule":
                    self.create_capsule(key, params[0], params[1], pw, euler)
                elif shape.kind == "halfspace":
                    n = params[:3]
                    self.create_box(
                        key, (10.0, 0.01, 10.0),
                        np.asarray(n) * params[3], (0, 0, 0),
                        color=(0.6, 0.6, 0.6, 1.0),
                    )
            else:
                self.set_object_position(key, pw)
                if shape.kind in ("box", "capsule"):
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
        html = html.replace(
            "const ws = new WebSocket(",
            frames_js + "const ws = { readyState: 0 }; void (",
        )
        with open(path, "w") as f:
            f.write(html)

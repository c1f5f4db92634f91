"""GUI state machine + websocket server loopback (test_Server.cpp /
test_GUIWebsocketServer.cpp analog, exercised with a real socket client)."""

import base64
import hashlib
import json
import socket
import struct
import time

import jax.numpy as jnp
import numpy as np

from nimblephysics_tpu.models import builders
from nimblephysics_tpu.models.model import State
from nimblephysics_tpu.server.state_machine import GUIRecording, GUIStateMachine
from nimblephysics_tpu.server.websocket import WebsocketServer, encode_text_frame


def test_state_machine_commands_and_recording(tmp_path):
    gui = GUIStateMachine()
    gui.create_box("b1", (1, 1, 1), (0, 0.5, 0))
    gui.create_sphere("s1", 0.2, (1, 0, 0))
    cmds = json.loads(gui.flush_json())
    assert [c["type"] for c in cmds] == ["create_box", "create_sphere"]
    gui.set_object_position("b1", (0, 1.0, 0))
    rec = GUIRecording()
    rec.record_frame(gui)
    gui.set_object_position("b1", (0, 1.5, 0))
    rec.record_frame(gui)
    path = tmp_path / "rec.jsonl"
    rec.write(str(path))
    frames = GUIRecording.read(str(path))
    assert len(frames) == 2
    assert frames[0][0]["pos"] == [0, 1.0, 0]
    # full state for a late-joining client has current positions
    full = json.loads(gui.full_state_json())
    b1 = [o for o in full if o["key"] == "b1"][0]
    assert b1["pos"] == [0, 1.5, 0]


def test_render_world_emits_shapes():
    model = builders.jump_worm()
    gui = GUIStateMachine()
    gui.render_world(model, State(q=jnp.zeros(4), v=jnp.zeros(4)))
    cmds = json.loads(gui.flush_json())
    kinds = {c["type"] for c in cmds}
    assert "create_box" in kinds  # worm root box + floor proxy
    # second render becomes position updates, not re-creates
    gui.render_world(model, State(q=jnp.ones(4) * 0.1, v=jnp.zeros(4)))
    cmds2 = json.loads(gui.flush_json())
    assert all(c["type"].startswith(("set_object",)) for c in cmds2)


def _ws_client(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(b"0123456789abcdef").decode()
    s.sendall(
        (
            f"GET / HTTP/1.1\r\nHost: localhost\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            f"Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert b"101" in resp.split(b"\r\n")[0]
    return s


def _read_text_frame(s):
    head = s.recv(2)
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack("!H", s.recv(2))[0]
    elif length == 127:
        length = struct.unpack("!Q", s.recv(8))[0]
    data = b""
    while len(data) < length:
        data += s.recv(length - len(data))
    return data


def test_websocket_roundtrip():
    received = []
    server = WebsocketServer(18971, on_message=lambda p: received.append(p))
    server.start()
    try:
        c = _ws_client(18971)
        deadline = time.time() + 5
        while server.num_clients == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert server.num_clients == 1
        server.broadcast(json.dumps([{"type": "create_box", "key": "k"}]))
        data = _read_text_frame(c)
        assert json.loads(data)[0]["key"] == "k"
        # client -> server (masked frame, as browsers send)
        payload = json.dumps({"type": "keydown", "key": "a"}).encode()
        mask = b"\x11\x22\x33\x44"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        c.sendall(b"\x81" + struct.pack("!B", 0x80 | len(payload)) + mask + masked)
        deadline = time.time() + 5
        while not received and time.time() < deadline:
            time.sleep(0.01)
        assert received and json.loads(received[0])["key"] == "a"
        c.close()
    finally:
        server.stop()


def test_standalone_html_export(tmp_path):
    from nimblephysics_tpu.models import builders
    from nimblephysics_tpu.server.state_machine import GUIRecording, GUIStateMachine

    model = builders.jump_worm()
    gui = GUIStateMachine()
    rec = GUIRecording()
    import jax.numpy as jnp

    from nimblephysics_tpu.models.model import State

    for k in range(3):
        gui.render_world(model, State(q=jnp.ones(4) * 0.1 * k, v=jnp.zeros(4)))
        rec.record_frame(gui)
    out = tmp_path / "replay.html"
    rec.write_standalone_html(str(out))
    html = out.read_text()
    assert "RECORDED_FRAMES" in html
    assert "create_box" in html
    assert html.count("set_object_position") >= 2


def test_gui_widgets_plots_and_drag_roundtrip():
    """UI widgets (button/slider/plot/rich plot), layers, and the drag
    event round-trip (GUIStateMachine.hpp:329-400 + GUIWebsocketServer drag
    events)."""
    import json as _json

    from nimblephysics_tpu.server.gui import NimbleGUI
    from nimblephysics_tpu.server.state_machine import GUIStateMachine

    gui = NimbleGUI()
    sm = gui.state_machine
    sm.create_button("b1", "Reset", pos=(10, 10))
    sm.create_slider("s1", lo=-1.0, hi=1.0, value=0.25)
    sm.create_plot("p1", min_x=0, max_x=10, min_y=-1, max_y=1,
                   xs=[0, 1, 2], ys=[0.0, 0.5, -0.5])
    sm.create_rich_plot("rp", title="loss")
    sm.set_rich_plot_data("rp", "train", [0, 1], [1.0, 0.5], color="red")
    sm.create_layer("debug", default_show=False)
    sm.set_layer_visible("debug", True)
    sm.create_mesh("hull", [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    state = _json.loads(sm.full_state_json())
    kinds = {c["type"] for c in state}
    assert {"create_button", "create_slider", "create_plot",
            "create_rich_plot", "create_mesh"} <= kinds
    # rich plot series retained for late-joining clients
    rp = next(c for c in state if c["type"] == "create_rich_plot")
    assert "train" in rp["data"]

    # event dispatch round-trip (wire format -> listener callbacks)
    got = {}
    gui.register_button_listener("b1", lambda: got.setdefault("btn", True))
    gui.register_slider_listener("s1", lambda v: got.setdefault("slider", v))
    gui.register_drag_listener("hull", lambda p: got.setdefault("drag", p))
    gui._on_message(_json.dumps({"type": "button_click", "key": "b1"}).encode())
    gui._on_message(_json.dumps(
        {"type": "slider_change", "key": "s1", "value": 0.7}).encode())
    gui._on_message(_json.dumps(
        {"type": "drag", "key": "hull", "pos": [1.0, 2.0, 3.0]}).encode())
    assert got == {"btn": True, "slider": 0.7, "drag": [1.0, 2.0, 3.0]}
    # drag also updated the retained scene position
    assert sm.objects["hull"]["pos"] == [1.0, 2.0, 3.0]


def test_render_world_convex_and_heightmap_as_meshes():
    from nimblephysics_tpu.models.model import ShapeSpec, State, build_model
    from nimblephysics_tpu.ops.lie import Transform
    from nimblephysics_tpu.server.state_machine import GUIStateMachine

    joints = [dict(type="free", name="r", body_name="b", parent=-1, mass=1.0)]
    hull_v = jnp.asarray([[0.0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [0, 0, 0.1]])
    shapes = (
        ShapeSpec(kind="convex", body_index=0,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.zeros(4), vertices=hull_v,
                  faces=jnp.zeros((4, 4))),
        ShapeSpec(kind="heightmap", body_index=-1,
                  offset=Transform(jnp.eye(3), jnp.zeros(3)),
                  params=jnp.asarray([-1.0, -1.0, 0.5, 0.5]),
                  vertices=jnp.zeros((4, 4))),
    )
    model = build_model(joints, dt=0.01, shapes=shapes, actuated=())
    sm = GUIStateMachine()
    sm.render_world(model, State(q=jnp.zeros(6), v=jnp.zeros(6)))
    import json as _json
    cmds = _json.loads(sm.full_state_json())
    meshes = [c for c in cmds if c["type"] == "create_mesh"]
    assert len(meshes) == 2
    hm = [m for m in meshes if m["faces"]][0]
    assert len(hm["faces"]) == 2 * 3 * 3     # (H-1)(W-1) quads x 2 tris

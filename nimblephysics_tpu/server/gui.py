"""`NimbleGUI` — serve a live world view in the browser.

Maps `python/nimblephysics/gui_server.py` + `GUIWebsocketServer::serve`:
an HTTP thread serves the bundled viewer page; a websocket server streams
GUI-protocol JSON diffs at a throttled framerate (the reference's
flushThread, GUIWebsocketServer.hpp:59-89) and receives viewer events.
"""

from __future__ import annotations

import http.server
import json
import os
import threading
import time
from functools import partial
from typing import Callable, Dict, List, Optional

from nimblephysics_tpu.models.model import Model, State
from nimblephysics_tpu.server.state_machine import GUIStateMachine
from nimblephysics_tpu.server.websocket import WebsocketServer

_VIEWER_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "web_gui")


class NimbleGUI:
    def __init__(self, model: Optional[Model] = None, fps: float = 30.0):
        self.model = model
        self.state_machine = GUIStateMachine()
        self.fps = fps
        self._ws: Optional[WebsocketServer] = None
        self._http: Optional[http.server.ThreadingHTTPServer] = None
        self._flush_thread: Optional[threading.Thread] = None
        self._running = False
        self._key_listeners: List[Callable[[str, bool], None]] = []
        self._drag_listeners: Dict[str, List[Callable]] = {}
        self._button_listeners: Dict[str, List[Callable]] = {}
        self._slider_listeners: Dict[str, List[Callable]] = {}

    # -- lifecycle ----------------------------------------------------------
    def serve(self, port: int = 8070) -> None:
        """HTTP viewer on `port`, websocket on `port+1`."""
        handler = partial(
            http.server.SimpleHTTPRequestHandler, directory=_VIEWER_DIR
        )
        self._http = http.server.ThreadingHTTPServer(("0.0.0.0", port), handler)
        threading.Thread(target=self._http.serve_forever, daemon=True).start()

        self._ws = WebsocketServer(
            port + 1,
            on_message=self._on_message,
            on_connect=lambda c: self._ws.send_to(
                c, self.state_machine.full_state_json()
            ),
        )
        self._ws.start()
        self._running = True
        self._flush_thread = threading.Thread(target=self._flush_loop, daemon=True)
        self._flush_thread.start()

    def stop(self) -> None:
        self._running = False
        if self._ws:
            self._ws.stop()
        if self._http:
            self._http.shutdown()

    # -- rendering ----------------------------------------------------------
    def render_world(self, state: State) -> None:
        assert self.model is not None
        self.state_machine.render_world(self.model, state)

    def flush(self) -> None:
        if self._ws and self._ws.num_clients:
            payload = self.state_machine.flush_json()
            if payload != "[]":
                self._ws.broadcast(payload)

    def _flush_loop(self) -> None:
        period = 1.0 / self.fps
        while self._running:
            self.flush()
            time.sleep(period)

    # -- events (keydown/drag/button/slider, GUIWebsocketServer.hpp:76) ------
    def register_key_listener(self, fn: Callable[[str, bool], None]) -> None:
        self._key_listeners.append(fn)

    def register_drag_listener(
        self, key: str, fn: Callable[[List[float]], None]
    ) -> None:
        """Viewer drags of object `key` call back with the new world
        position (the round-trip behind the reference's interactive
        target-dragging demos). Marks the object draggable."""
        self.state_machine.set_object_draggable(key, True)
        self._drag_listeners.setdefault(key, []).append(fn)

    def register_button_listener(self, key: str, fn: Callable[[], None]) -> None:
        self._button_listeners.setdefault(key, []).append(fn)

    def register_slider_listener(
        self, key: str, fn: Callable[[float], None]
    ) -> None:
        self._slider_listeners.setdefault(key, []).append(fn)

    def _on_message(self, payload: bytes) -> None:
        try:
            msg = json.loads(payload.decode())
        except (ValueError, UnicodeDecodeError):
            return
        t = msg.get("type")
        if t in ("keydown", "keyup"):
            for fn in self._key_listeners:
                fn(msg.get("key", ""), t == "keydown")
        elif t == "drag":
            # keep the retained scene consistent, then notify
            pos = msg.get("pos", [0, 0, 0])
            self.state_machine.set_object_position(msg.get("key", ""), pos)
            for fn in self._drag_listeners.get(msg.get("key", ""), []):
                fn(pos)
        elif t == "button_click":
            for fn in self._button_listeners.get(msg.get("key", ""), []):
                fn()
        elif t == "slider_change":
            v = float(msg.get("value", 0.0))
            for fn in self._slider_listeners.get(msg.get("key", ""), []):
                fn(v)

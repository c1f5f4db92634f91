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

    # -- events (keydown etc., GUIWebsocketServer.hpp:76) --------------------
    def register_key_listener(self, fn: Callable[[str, bool], None]) -> None:
        self._key_listeners.append(fn)

    def _on_message(self, payload: bytes) -> None:
        try:
            msg = json.loads(payload.decode())
        except (ValueError, UnicodeDecodeError):
            return
        if msg.get("type") in ("keydown", "keyup"):
            for fn in self._key_listeners:
                fn(msg.get("key", ""), msg["type"] == "keydown")

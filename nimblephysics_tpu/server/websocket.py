"""Minimal RFC 6455 websocket server on the standard library.

The reference vendors websocketpp/asio for its C++ `GUIWebsocketServer`
(`dart/server/external/`); this environment has no `websockets` package, so
the handshake + frame codec are implemented directly (text frames only —
all the GUI protocol needs). Thread-per-client, broadcast fan-out, optional
receive callback for viewer events (keydown/drag — GUIWebsocketServer.hpp:76).
"""

from __future__ import annotations

import base64
import hashlib
import socket
import struct
import threading
from typing import Callable, List, Optional

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _accept_key(key: str) -> str:
    digest = hashlib.sha1((key + _WS_MAGIC).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_text_frame(payload: bytes) -> bytes:
    n = len(payload)
    header = b"\x81"  # FIN + text opcode
    if n < 126:
        header += struct.pack("!B", n)
    elif n < 65536:
        header += struct.pack("!BH", 126, n)
    else:
        header += struct.pack("!BQ", 127, n)
    return header + payload


def decode_frame(sock: socket.socket) -> Optional[bytes]:
    """Read one frame; returns payload for text frames, None on close."""
    head = sock.recv(2)
    if len(head) < 2:
        return None
    opcode = head[0] & 0x0F
    masked = head[1] & 0x80
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack("!H", sock.recv(2))[0]
    elif length == 127:
        length = struct.unpack("!Q", sock.recv(8))[0]
    mask = sock.recv(4) if masked else b"\x00" * 4
    data = b""
    while len(data) < length:
        chunk = sock.recv(length - len(data))
        if not chunk:
            return None
        data += chunk
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    if opcode == 0x8:  # close
        return None
    if opcode in (0x1, 0x2):
        return data
    return b""  # ping/pong/continuation: ignore payload


class WebsocketServer:
    def __init__(self, port: int, on_message: Optional[Callable[[bytes], None]] = None,
                 on_connect: Optional[Callable[[socket.socket], None]] = None):
        self.port = port
        self.on_message = on_message
        self.on_connect = on_connect
        self._clients: List[socket.socket] = []
        self._lock = threading.Lock()
        self._server: Optional[socket.socket] = None
        self._running = False

    def start(self) -> None:
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind(("0.0.0.0", self.port))
        self._server.listen(8)
        self._running = True
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while self._running:
            try:
                client, _ = self._server.accept()
            except OSError:
                break
            threading.Thread(
                target=self._client_loop, args=(client,), daemon=True
            ).start()

    def _client_loop(self, client: socket.socket) -> None:
        try:
            request = b""
            while b"\r\n\r\n" not in request:
                chunk = client.recv(4096)
                if not chunk:
                    return
                request += chunk
            key = None
            for line in request.decode(errors="replace").split("\r\n"):
                if line.lower().startswith("sec-websocket-key:"):
                    key = line.split(":", 1)[1].strip()
            if key is None:
                client.close()
                return
            response = (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
            )
            client.sendall(response.encode())
            with self._lock:
                self._clients.append(client)
            if self.on_connect:
                self.on_connect(client)
            while self._running:
                payload = decode_frame(client)
                if payload is None:
                    break
                if payload and self.on_message:
                    self.on_message(payload)
        except OSError:
            pass
        finally:
            with self._lock:
                if client in self._clients:
                    self._clients.remove(client)
            client.close()

    def send_to(self, client: socket.socket, text: str) -> None:
        try:
            client.sendall(encode_text_frame(text.encode()))
        except OSError:
            pass

    def broadcast(self, text: str) -> None:
        frame = encode_text_frame(text.encode())
        with self._lock:
            clients = list(self._clients)
        for c in clients:
            try:
                c.sendall(frame)
            except OSError:
                pass

    @property
    def num_clients(self) -> int:
        with self._lock:
            return len(self._clients)

    def stop(self) -> None:
        self._running = False
        if self._server:
            try:
                self._server.close()
            except OSError:
                pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()

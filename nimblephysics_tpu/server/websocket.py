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


class WebsocketClient:
    """Minimal RFC 6455 CLIENT — the transport for the scripted viewer
    check (scripts/check_viewer.py drives the GUI server exactly the way
    the browser page does) and for headless GUI-protocol consumers."""

    def __init__(self, host: str, port: int, timeout: float = 5.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        key = base64.b64encode(b"nimblephysics_tpu").decode()
        self.sock.sendall(
            (
                f"GET / HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        # read the handshake BYTE-WISE: the server may coalesce its 101
        # response with the first websocket frame in one TCP segment, and
        # a block recv would swallow (and lose) those frame bytes
        response = b""
        while not response.endswith(b"\r\n\r\n"):
            chunk = self.sock.recv(1)
            if not chunk:
                raise ConnectionError("websocket handshake failed")
            response += chunk
        if b"101" not in response.split(b"\r\n", 1)[0]:
            raise ConnectionError(f"unexpected handshake: {response[:80]!r}")

    def recv_text(self) -> Optional[str]:
        payload = decode_frame(self.sock)
        return None if payload is None else payload.decode()

    def send_text(self, text: str) -> None:
        # client-to-server frames MUST be masked (RFC 6455 §5.3)
        payload = text.encode()
        mask = b"\x12\x34\x56\x78"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        n = len(payload)
        header = b"\x81"
        if n < 126:
            header += struct.pack("!B", 0x80 | n)
        elif n < 65536:
            header += struct.pack("!BH", 0x80 | 126, n)
        else:
            header += struct.pack("!BQ", 0x80 | 127, n)
        self.sock.sendall(header + mask + masked)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


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
            # on_connect (the full-state snapshot) must complete BEFORE
            # the client joins the broadcast list: otherwise a flush diff
            # can interleave ahead of the snapshot and the viewer builds
            # its scene from a diff (found by scripts/check_viewer.py)
            if self.on_connect:
                self.on_connect(client)
            with self._lock:
                self._clients.append(client)
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

"""Minimal server-side WebSocket (RFC 6455) framing — stdlib only.

The reference streams RUN/COMPILE logs over a websocket
(http/main.go:47-84, gorilla/websocket); our server serves the same
log stream as SSE *and* accepts a websocket upgrade on the same route
so a reference-shaped client connects unchanged. Only the subset a
log-stream server needs is implemented: the opening handshake, text
frames server->client (unmasked, per the RFC), and reading/unmasking
client frames far enough to honor CLOSE.
"""

from __future__ import annotations

import base64
import hashlib
import struct

# RFC 6455 §1.3 fixed GUID used in the Sec-WebSocket-Accept digest
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def is_upgrade_request(headers) -> bool:
    """True when the request asks for a websocket upgrade
    (case-insensitive per RFC 7230; Connection may list tokens)."""
    upgrade = (headers.get("Upgrade") or "").lower()
    connection = (headers.get("Connection") or "").lower()
    return upgrade == "websocket" and "upgrade" in connection


def accept_key(client_key: str) -> str:
    """Sec-WebSocket-Accept value for a client's Sec-WebSocket-Key."""
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def send_frame(wfile, payload: bytes | str, opcode: int = OP_TEXT) -> None:
    """Write one FIN frame, server->client (unmasked, RFC 6455 §5.1)."""
    if isinstance(payload, str):
        payload = payload.encode()
    n = len(payload)
    head = bytes([0x80 | opcode])
    if n < 126:
        head += bytes([n])
    elif n < (1 << 16):
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    wfile.write(head + payload)
    wfile.flush()


def parse_frame(buf: bytearray) -> tuple[int, bytes] | None:
    """Parse one complete frame off the FRONT of ``buf``, consuming
    its bytes; None when the buffer doesn't yet hold a whole frame.
    Lets a caller drain a non-blocking socket into an explicit byte
    buffer and handle frames as they complete — a frame split across
    packets simply stays buffered until the rest arrives, without
    ever blocking the caller."""
    if len(buf) < 2:
        return None
    opcode = buf[0] & 0x0F
    masked = buf[1] & 0x80
    n = buf[1] & 0x7F
    i = 2
    if n == 126:
        if len(buf) < 4:
            return None
        n = struct.unpack(">H", bytes(buf[2:4]))[0]
        i = 4
    elif n == 127:
        if len(buf) < 10:
            return None
        n = struct.unpack(">Q", bytes(buf[2:10]))[0]
        i = 10
    mask = b"\x00" * 4
    if masked:
        if len(buf) < i + 4:
            return None
        mask = bytes(buf[i:i + 4])
        i += 4
    if len(buf) < i + n:
        return None
    data = bytes(buf[i:i + n])
    del buf[:i + n]
    if masked:
        data = bytes(b ^ mask[j % 4] for j, b in enumerate(data))
    return opcode, data


def recv_frame(rfile) -> tuple[int, bytes] | None:
    """Read one client frame; returns (opcode, unmasked payload) or
    None on EOF. Client frames are always masked (RFC 6455 §5.3)."""
    head = rfile.read(2)
    if len(head) < 2:
        return None
    opcode = head[0] & 0x0F
    masked = head[1] & 0x80
    n = head[1] & 0x7F
    if n == 126:
        n = struct.unpack(">H", rfile.read(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", rfile.read(8))[0]
    mask = rfile.read(4) if masked else b"\x00" * 4
    data = rfile.read(n)
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, data

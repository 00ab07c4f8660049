"""Second, independent TDS fixture (VERDICT r13 #8): the e2e test
drives the client against a server built from THIS repo's codec, so a
symmetric encode/decode bug would pass silently. Here the server side
is a hand-authored byte capture transliterated field-by-field from the
public [MS-TDS] spec (2.2.6.5 PRELOGIN, 2.2.7.8 ENVCHANGE, 2.2.7.12
INFO, 2.2.7.13 LOGINACK, 2.2.7.6 DONE) in the shape a real SQL Server
sends for a successful login — ENVCHANGE(database) first, an INFO
notice, LOGINACK with the 'Microsoft SQL Server' program name, a
packet-size ENVCHANGE, final DONE — none of it produced by
sources/tds.py's encoders.

The capture is additionally delivered FRAGMENTED: 5-byte packet
bodies, so every token is split across several packets (headers also
hand-built, with a nonzero SPID like a real server). The codec's
decode half and the socket client must reassemble byte-transparently.
"""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from analyst_spark.sources import tds
from analyst_spark.sources.tds_client import TdsClient


def _ucs2(s: str) -> bytes:
    return s.encode("utf-16-le")


def _b_varchar(s: str) -> bytes:
    return bytes([len(s)]) + _ucs2(s)


def _us_varchar(s: str) -> bytes:
    return struct.pack("<H", len(s)) + _ucs2(s)


def _token(tok: int, body: bytes) -> bytes:
    return bytes([tok]) + struct.pack("<H", len(body)) + body


# --- the login-response capture, authored from the spec ------------

# ENVCHANGE type 1 (database): new 'analyst', old 'master'
_ENV_DB = _token(0xE3, bytes([1]) + _b_varchar("analyst") + _b_varchar("master"))
# INFO 5701 'Changed database context' — severity 0, with REAL server
# and proc names (the e2e fake always sends empty b_varchars here)
_INFO = _token(
    0xAB,
    struct.pack("<IBB", 5701, 2, 0)
    + _us_varchar("Changed database context to 'analyst'.")
    + _b_varchar("FAKESRV01")
    + _b_varchar("sp_login")
    + struct.pack("<I", 1),
)
# LOGINACK: interface 1 (SQL_TSQL), TDS 7.4 big-endian, the program
# name a real server reports, version 16.0.4095
_LOGINACK = _token(
    0xAD,
    bytes([1])
    + struct.pack(">I", 0x74000004)
    + _b_varchar("Microsoft SQL Server")
    + bytes([16, 0, 0x0F, 0xFF]),
)
# ENVCHANGE type 4 (packet size): negotiate the client down to 512
_ENV_PKT = _token(0xE3, bytes([4]) + _b_varchar("512") + _b_varchar("4096"))
# DONE: status DONE_FINAL (0x0000), curcmd 0, 8-byte row count 0
_DONE = bytes([0xFD]) + struct.pack("<HHQ", 0x0000, 0, 0)

LOGIN_RESPONSE = _ENV_DB + _INFO + _LOGINACK + _ENV_PKT + _DONE

# ERROR capture with populated server/proc names and line number
ERROR_RESPONSE = (
    _token(
        0xAA,
        struct.pack("<IBB", 208, 1, 16)
        + _us_varchar("Invalid object name 'missing_table'.")
        + _b_varchar("FAKESRV01")
        + _b_varchar("")
        + struct.pack("<I", 12),
    )
    + _DONE
)

# PRELOGIN response: VERSION 16.0.4095.0, ENCRYPT_NOT_SUP, INSTOPT,
# THREADID (empty — servers send it zero-length), MARS off
_PL_OPTS = [
    (0x00, struct.pack(">BBHH", 16, 0, 4095, 0)),
    (0x01, b"\x02"),
    (0x02, b"\x00"),
    (0x03, b""),
    (0x04, b"\x00"),
]
_PL_TABLE_LEN = len(_PL_OPTS) * 5 + 1


def _prelogin_response() -> bytes:
    table, payload = b"", b""
    off = _PL_TABLE_LEN
    for tok, body in _PL_OPTS:
        table += struct.pack(">BHH", tok, off, len(body))
        payload += body
        off += len(body)
    return table + b"\xff" + payload


def fragment(ptype: int, payload: bytes, body_max: int = 5) -> bytes:
    """Hand-built packet stream: 8-byte headers with a nonzero SPID
    (a real server stamps its session id), bodies capped at
    ``body_max`` so tokens split mid-field."""
    views = [
        payload[i : i + body_max] for i in range(0, len(payload), body_max)
    ] or [b""]
    out = b""
    for i, chunk in enumerate(views):
        status = 0x01 if i == len(views) - 1 else 0x00
        out += (
            struct.pack(
                ">BBHHBB", ptype, status, 8 + len(chunk), 0x1234,
                (i + 1) & 0xFF, 0,
            )
            + chunk
        )
    return out


# --- codec-level assertions ----------------------------------------


def test_parse_tokens_on_captured_login_response():
    kinds = tds.parse_tokens(LOGIN_RESPONSE)
    assert [k for k, _ in kinds] == [
        "ENVCHANGE", "INFO", "LOGINACK", "ENVCHANGE", "DONE",
    ]
    env_db, info, ack, env_pkt, done = [i for _, i in kinds]
    assert (env_db["type"], env_db["new"], env_db["old"]) == (1, "analyst", "master")
    assert info["number"] == 5701
    assert info["server"] == "FAKESRV01"
    assert info["proc"] == "sp_login"
    assert ack["tds_version"] == 0x74000004
    assert ack["prog_name"] == "Microsoft SQL Server"
    assert (env_pkt["type"], env_pkt["new"]) == (4, "512")
    assert done == {"status": 0, "curcmd": 0, "row_count": 0}


def test_parse_tokens_on_captured_error_response():
    kinds = tds.parse_tokens(ERROR_RESPONSE)
    assert kinds[0][0] == "ERROR"
    err = kinds[0][1]
    assert err["number"] == 208
    assert err["severity"] == 16
    assert err["server"] == "FAKESRV01"
    assert "missing_table" in err["message"]


def test_decode_packets_reassembles_mid_token_fragments():
    stream = fragment(tds.PKT_RESPONSE, LOGIN_RESPONSE, body_max=5)
    # every 5-byte body splits each multi-byte token across packets
    assert len(stream) > len(LOGIN_RESPONSE) * 2
    ptype, payload = tds.decode_packets(stream)
    assert ptype == tds.PKT_RESPONSE
    assert payload == LOGIN_RESPONSE
    # and the reassembled bytes still parse token-exact
    assert len(tds.parse_tokens(payload)) == 5


# --- client-level: the real socket client against the capture ------


class CannedTdsServer:
    """One-connection server that answers PRELOGIN and LOGIN7 with
    the hand-authored captures, fragmented at 5-byte bodies. It
    parses NOTHING with sources/tds.py — it only counts packet
    framing to find each inbound message's end."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.inbound: list[int] = []
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _read_message(self, conn) -> int | None:
        ptype = None
        while True:
            header = b""
            while len(header) < 8:
                chunk = conn.recv(8 - len(header))
                if not chunk:
                    return None
                header += chunk
            t, status, length = struct.unpack(">BBH", header[:4])
            ptype = t if ptype is None else ptype
            need = length - 8
            while need:
                chunk = conn.recv(need)
                if not chunk:
                    return None
                need -= len(chunk)
            if status & 0x01:
                return ptype

    def _serve(self):
        conn, _ = self.sock.accept()
        try:
            while True:
                ptype = self._read_message(conn)
                if ptype is None:
                    return
                self.inbound.append(ptype)
                if ptype == tds.PKT_PRELOGIN:
                    conn.sendall(
                        fragment(tds.PKT_RESPONSE, _prelogin_response())
                    )
                elif ptype == tds.PKT_LOGIN7:
                    conn.sendall(fragment(tds.PKT_RESPONSE, LOGIN_RESPONSE))
                else:
                    conn.sendall(fragment(tds.PKT_RESPONSE, ERROR_RESPONSE))
        finally:
            conn.close()

    def close(self):
        self.sock.close()


@pytest.fixture()
def canned():
    srv = CannedTdsServer()
    try:
        yield srv
    finally:
        srv.close()


def test_client_logs_in_against_fragmented_capture(canned):
    c = TdsClient("127.0.0.1", canned.port, "sa", "pw", database="analyst")
    try:
        # INFO token tolerated, LOGINACK found, packet-size ENVCHANGE
        # honored — all from bytes this repo's encoders never produced
        assert c.packet_size == 512
        assert canned.inbound[:2] == [tds.PKT_PRELOGIN, tds.PKT_LOGIN7]
    finally:
        c.close()

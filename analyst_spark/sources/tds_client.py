"""Socket transport for the MS-TDS codec (sources/tds.py) — a
stdlib-only SQL Server client covering exactly the conversation the
reference's MSSQL bulk-copy path holds (engine/sql_inserter.go:79-124
via the driver's bcp API): PRELOGIN → LOGIN7 → SQLBatch → INSERT BULK
+ BulkLoadBCP stream.

The sandbox has no SQL Server, so this client is exercised end-to-end
against the protocol-correct in-process server in
tests/test_tds_e2e.py — real sockets, real packet framing (including
multi-packet messages at small negotiated packet sizes), the real
password scramble. If a server ever appears, this is the missing
transport, the same way sources/pgwire.py closed the postgres gap.
"""

from __future__ import annotations

import socket
import struct

from analyst_spark.sources import tds


class TdsError(RuntimeError):
    def __init__(self, number: int, message: str):
        super().__init__(f"TDS error {number}: {message}")
        self.number = number


class TdsClient:
    """Minimal TDS 7.4 client: login, SQL batches, bulk insert."""

    def __init__(
        self,
        host: str,
        port: int,
        username: str,
        password: str,
        database: str = "",
        appname: str = "analyst-spark",
        packet_size: int = tds.MAX_PACKET,
        timeout: float = 10.0,
    ):
        self.packet_size = packet_size
        self.sock = socket.create_connection((host, port), timeout=timeout)
        try:
            self._prelogin()
            self._login(username, password, database, appname)
        except BaseException:
            # a failed handshake must not leak the connected socket
            # (every rejected login would otherwise hold an fd until GC)
            self.sock.close()
            raise

    # ------------------------------------------------------------ transport

    def _send(self, ptype: int, payload: bytes) -> None:
        self.sock.sendall(
            tds.encode_packets(ptype, payload, packet_size=self.packet_size)
        )

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("TDS server closed the connection")
            buf += chunk
        return buf

    def _recv_message(self) -> tuple[int, bytes]:
        """Read packets off the socket until EOM; returns
        (packet type, reassembled payload)."""
        ptype = None
        out = []
        while True:
            header = self._recv_exact(tds.HEADER_LEN)
            t, status, length, _spid, _pid, _win = struct.unpack(
                ">BBHHBB", header
            )
            if ptype is None:
                ptype = t
            elif t != ptype:
                raise ValueError(f"packet type changed mid-message: {ptype}->{t}")
            out.append(self._recv_exact(length - tds.HEADER_LEN))
            if status & tds.STATUS_EOM:
                return ptype, b"".join(out)

    def _response_tokens(self) -> list[tuple[str, dict]]:
        ptype, payload = self._recv_message()
        if ptype != tds.PKT_RESPONSE:
            raise ValueError(f"expected response packet, got type 0x{ptype:02x}")
        tokens = tds.parse_tokens(payload)
        for kind, info in tokens:
            if kind == "ERROR":
                raise TdsError(info["number"], info["message"])
        return tokens

    # ------------------------------------------------------------ handshake

    def _prelogin(self) -> None:
        self._send(tds.PKT_PRELOGIN, tds.prelogin_payload())
        ptype, payload = self._recv_message()
        if ptype != tds.PKT_RESPONSE:
            raise ValueError("bad PRELOGIN response packet type")
        opts = tds.parse_prelogin(payload)
        enc = opts.get(tds.PL_ENCRYPTION, b"\x02")[0]
        if enc not in (tds.ENCRYPT_NOT_SUP, 0x00):
            raise NotImplementedError("TLS-required server; plaintext client")

    def _login(
        self, username: str, password: str, database: str, appname: str
    ) -> None:
        lg = tds.Login7(
            hostname=socket.gethostname()[:64],
            username=username,
            password=password,
            appname=appname,
            database=database,
            packet_size=self.packet_size,
        )
        self._send(tds.PKT_LOGIN7, tds.login7_payload(lg))
        tokens = self._response_tokens()
        if not any(kind == "LOGINACK" for kind, _ in tokens):
            raise ConnectionError("login not acknowledged")
        for kind, info in tokens:
            # honor a server-negotiated packet size (ENVCHANGE type 4)
            if kind == "ENVCHANGE" and info["type"] == 4:
                self.packet_size = int(info["new"])

    # ------------------------------------------------------------ execution

    def exec_batch(self, sql: str) -> int:
        """Run a no-resultset T-SQL batch; returns the DONE row count."""
        self._send(tds.PKT_SQL_BATCH, tds.sql_batch_payload(sql))
        rows = 0
        for kind, info in self._response_tokens():
            if kind == "DONE":
                rows = info["row_count"]
        return rows

    def bulk_insert(
        self,
        table: str,
        columns: list[tuple[str, str]],
        rows: list[list],
    ) -> int:
        """The bulk-copy conversation `useBulkCopyForBatchInsert`
        drives: `INSERT BULK` as a SQLBatch, then the BulkLoadBCP
        token stream (COLMETADATA + ROW* + DONE) as a bulk-load
        message. Returns the server-acknowledged row count."""
        self.exec_batch(tds.insert_bulk_statement(table, columns))
        self._send(
            tds.PKT_BULK_LOAD, tds.bulk_load_payload(table, columns, rows)
        )
        landed = 0
        for kind, info in self._response_tokens():
            if kind == "DONE":
                landed = info["row_count"]
        return landed

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

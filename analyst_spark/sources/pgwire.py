"""Minimal PostgreSQL wire-protocol (v3) client — stdlib only.

The reference registers a real postgres driver and executes verbatim
SQL on it (engine/sql_source.go:5-9, sql_inserter.go:126-171). This
container ships a real PostgreSQL server binary but no client driver
(no pgjdbc jar, no psycopg2), so this module implements the small,
fully-public subset of the v3 frontend/backend protocol
(https://www.postgresql.org/docs/current/protocol.html) that the
engine's DB-API seams need: startup + trust/cleartext auth, the
simple-query flow (Q → RowDescription/DataRow/CommandComplete/
ReadyForQuery), and error surfacing. Text result format only.

This is NOT a general driver: no extended protocol, no prepared
statements, no TLS. COPY ... FROM STDIN (text format) IS
implemented (``PgWireConnection.copy_in``) because the reference's
postgres inserter strategy is pq.CopyIn (engine/sql_inserter.go:
145-171) — bulk writes route through it. It exists so the CONNECTION
driver='postgres' path can be executed against a LIVE server in
tests (tests/test_pgwire.py spins up the bundled postgres under a
non-root uid) instead of stopping at option assembly. Production
Spark reads/writes still go through the JDBC reader/writer
(sources/jdbc.py, sinks/jdbc.py) — one connection streaming rows
through the driver is exactly the single-node bottleneck the
distributed path avoids.
"""

from __future__ import annotations

import datetime as _dt
import math
import socket
import struct

_PROTO_V3 = 196608  # 3 << 16


class PgError(Exception):
    """Server ErrorResponse (fields keyed by the protocol's
    single-letter codes: S severity, C sqlstate, M message)."""

    def __init__(self, fields: dict):
        self.fields = fields
        super().__init__(fields.get("M", "postgres error"))


def _parse_error(payload: bytes) -> dict:
    fields = {}
    i = 0
    while i < len(payload) and payload[i] != 0:
        code = chr(payload[i])
        j = payload.index(b"\0", i + 1)
        fields[code] = payload[i + 1 : j].decode("utf-8", "replace")
        i = j + 1
    return fields


def _convert(typoid: int, text: str):
    """Text-format value → python, by type OID (pg_type.dat, public
    catalog numbers). Unknown OIDs stay strings."""
    if typoid == 16:  # bool
        return text == "t"
    if typoid in (20, 21, 23, 26):  # int8/int2/int4/oid
        return int(text)
    if typoid in (700, 701, 1700):  # float4/float8/numeric
        return float(text)
    if typoid == 1082:  # date
        return _dt.date.fromisoformat(text)
    if typoid in (1114, 1184):  # timestamp / timestamptz
        # server emits ISO with space separator; fromisoformat accepts
        return _dt.datetime.fromisoformat(text)
    return text


def quote_literal(v) -> str:
    """SQL literal for ``?`` substitution — the same printed-literal
    device the reference's AutoSQL staging uses
    (engine/auto_sql_transform.go:156-168)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and not math.isfinite(v):
        # repr() would emit bare nan/inf tokens, which the server
        # parses as identifiers and rejects confusingly; postgres
        # accepts these special values only as quoted float8 input
        if math.isnan(v):
            return "'NaN'::float8"
        return "'Infinity'::float8" if v > 0 else "'-Infinity'::float8"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "'" + v.isoformat() + "'"
    s = str(v)
    if "\x00" in s:
        # a NUL would terminate the simple-query C string mid-SQL;
        # postgres text values cannot store \x00 at all, so fail
        # clearly client-side instead of sending a truncated query
        raise ValueError(
            "string value contains a NUL byte; PostgreSQL text "
            "cannot represent \\x00"
        )
    return "'" + s.replace("'", "''") + "'"


# PostgreSQL's COMPLETE reserved set — the RESERVED_KEYWORD and
# TYPE_FUNC_NAME_KEYWORD categories of src/include/parser/kwlist.h
# (PG 15; docs Appendix C "reserved"): neither category may stand as
# a bare column/table name, so both still get quoted even though they
# match the bare-name shape. Partial lists here caused real syntax
# errors (a column named `do` or `current_user` went out bare).
_RESERVED = frozenset(
    """all analyse analyze and any array as asc asymmetric both case
    cast check collate column constraint create current_catalog
    current_date current_role current_time current_timestamp
    current_user default deferrable desc distinct do else end except
    false fetch for foreign from grant group having in initially
    intersect into lateral leading limit localtime localtimestamp not
    null offset on only or order placing primary references returning
    select session_user some symmetric table then to trailing true
    union unique user using variadic when where window with
    authorization binary collation concurrently cross current_schema
    freeze full ilike inner is isnull join left like natural notnull
    outer overlaps right similar tablesample verbose
    between""".split()
)

_BARE_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def quote_ident(name: str) -> str:
    """SQL identifier, quoted ONLY when needed (r7 advice): any name
    that is a legal bare identifier is emitted VERBATIM so it
    case-folds exactly the way the reference's DefaultInserter does
    (sql_inserter.go Statement() emits identifiers unquoted —
    ``TABLE = 'MyTable'`` matches a lowercase-stored table). Names
    that cannot stand bare (spaces, punctuation, leading digits,
    reserved words) get double-quoted with embedded-quote doubling;
    dotted names are handled per segment (schema.table).

    MIGRATION NOTE (r8 advice): before r8 every identifier was
    quoted, so a pre-existing table CREATED with a quoted mixed-case
    name (``CREATE TABLE "MyTable"``) was reachable via
    ``TABLE = 'MyTable'``. Under verbatim emission that name now
    case-folds to ``mytable`` server-side and misses the quoted
    object. Escape hatch: pass the name WITH the quote characters —
    ``TABLE = '"MyTable"'`` — and the pre-quoted segment is emitted
    exactly as written (embedded ``""`` pairs preserved)."""

    def _is_valid_quoted(part: str) -> bool:
        # A pre-quoted segment is accepted verbatim ONLY when it
        # parses as ONE complete quoted identifier: wrapped in
        # double quotes, non-empty body, every interior quote in a
        # doubled pair, and the closing quote is the final char
        # (r9 advice: '"a"; DROP TABLE t; --"' must NOT pass).
        if len(part) < 3 or part[0] != '"' or part[-1] != '"':
            return False
        body = part[1:-1]
        i = 0
        while i < len(body):
            if body[i] == '"':
                if i + 1 >= len(body) or body[i + 1] != '"':
                    return False  # lone interior quote
                i += 2
            else:
                i += 1
        return True

    def seg(part: str) -> str:
        # Always-quote escape hatch: a segment the user already
        # wrapped in double quotes is emitted verbatim — but only
        # after validating it is a single well-formed quoted
        # identifier; anything malformed falls through to full
        # quoting with embedded-quote doubling.
        if _is_valid_quoted(part):
            return part
        if _BARE_IDENT.match(part) and part.lower() not in _RESERVED:
            return part
        return '"' + part.replace('"', '""') + '"'

    # Split on dots OUTSIDE double quotes so a pre-quoted segment may
    # itself contain a dot ('"My.Table"' stays one segment).
    s = str(name)
    parts, buf, in_q, dot_in_q = [], [], False, False
    for ch in s:
        if ch == '"':
            in_q = not in_q
            buf.append(ch)
        elif ch == "." and not in_q:
            parts.append("".join(buf))
            buf = []
        else:
            if ch == "." and in_q:
                dot_in_q = True
            buf.append(ch)
    if in_q and dot_in_q:
        # r9 advice: an unterminated quote that swallowed a dot
        # silently changed segmentation (pre-r9, 'a"b.c' split at
        # the dot); fail loudly instead of guessing. A lone odd
        # quote WITHOUT a dot ('we"ird') stays legal — it has only
        # one possible segmentation and seg() safely doubles it.
        raise ValueError(
            "unterminated double quote swallowed a '.' separator in "
            f"identifier: {s!r}; close the quote or double it"
        )
    parts.append("".join(buf))
    return ".".join(seg(p) for p in parts)


def copy_text_value(v) -> str:
    """One value in COPY text format (delimiter-separated, \\N null,
    backslash escapes — postgresql.org/docs/current/sql-copy.html
    'Text Format')."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)
    if isinstance(v, (int,)):
        return repr(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    s = str(v)
    if "\x00" in s:
        raise ValueError(
            "string value contains a NUL byte; PostgreSQL text "
            "cannot represent \\x00"
        )
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


class PgWireConnection:
    """DB-API-shaped connection over the simple-query protocol.

    ``commit``/``rollback`` issue the statements only when a BEGIN has
    been executed on this connection (simple-query mode autocommits
    otherwise), which is what the job transaction manager's
    register/commit cycle expects.
    """

    def __init__(
        self,
        sockdir: str | None = None,
        host: str | None = None,
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
    ):
        if sockdir:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{sockdir}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host or "127.0.0.1", port))
        self._buf = b""
        self.in_txn = False
        params = f"user\0{user}\0database\0{database}\0\0".encode()
        self._sock.sendall(
            struct.pack(">ii", 8 + len(params), _PROTO_V3) + params
        )
        while True:
            t, payload = self._recv_msg()
            if t == "R":
                (code,) = struct.unpack(">i", payload[:4])
                if code == 0:
                    continue
                if code == 3:  # cleartext password
                    pw = (password or "").encode() + b"\0"
                    self._sock.sendall(b"p" + struct.pack(">i", 4 + len(pw)) + pw)
                    continue
                raise PgError({"M": f"unsupported auth method {code}"})
            if t in ("S", "K", "N"):  # ParameterStatus/KeyData/Notice
                continue
            if t == "Z":
                break
            if t == "E":
                raise PgError(_parse_error(payload))

    def _recv_msg(self) -> tuple[str, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError({"M": "server closed connection"})
            self._buf += chunk
        t = chr(self._buf[0])
        (n,) = struct.unpack(">i", self._buf[1:5])
        total = 1 + n
        while len(self._buf) < total:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError({"M": "server closed connection"})
            self._buf += chunk
        payload = self._buf[5:total]
        self._buf = self._buf[total:]
        return t, payload

    def _query(self, sql: str):
        """Simple query; returns (description, rows, rowcount)."""
        q = sql.encode() + b"\0"
        self._sock.sendall(b"Q" + struct.pack(">i", 4 + len(q)) + q)
        desc, rows, rowcount, err = None, [], -1, None
        typoids: list[int] = []
        while True:
            t, payload = self._recv_msg()
            if t == "T":  # RowDescription
                (nf,) = struct.unpack(">h", payload[:2])
                i = 2
                desc, typoids = [], []
                for _ in range(nf):
                    j = payload.index(b"\0", i)
                    name = payload[i:j].decode()
                    _tbl, _att, typoid, _tl, _tm, _fmt = struct.unpack(
                        ">ihihih", payload[j + 1 : j + 19]
                    )
                    desc.append((name, typoid, None, None, None, None, None))
                    typoids.append(typoid)
                    i = j + 19
            elif t == "D":  # DataRow
                (nc,) = struct.unpack(">h", payload[:2])
                i = 2
                row = []
                for c in range(nc):
                    (ln,) = struct.unpack(">i", payload[i : i + 4])
                    i += 4
                    if ln < 0:
                        row.append(None)
                    else:
                        row.append(
                            _convert(typoids[c], payload[i : i + ln].decode())
                        )
                        i += ln
                rows.append(tuple(row))
            elif t == "C":  # CommandComplete: "INSERT 0 3" / "SELECT 3"
                tag = payload.rstrip(b"\0").decode().split()
                if tag and tag[-1].isdigit():
                    rowcount = int(tag[-1])
                head = tag[0].upper() if tag else ""
                if head == "BEGIN":
                    self.in_txn = True
                elif head in ("COMMIT", "ROLLBACK"):
                    self.in_txn = False
            elif t == "E":
                err = _parse_error(payload)
            elif t == "Z":
                break
            # 'N' notices, 'S' parameter changes, 'I' EmptyQuery: skip
        if err is not None:
            raise PgError(err)
        return desc, rows, rowcount

    def copy_in(self, sql: str, lines) -> int:
        """``COPY ... FROM STDIN`` (text format) over the simple-query
        flow — the reference's PostgresInserter strategy
        (engine/sql_inserter.go:145-171, pq.CopyIn). ``lines`` yields
        pre-encoded text-format rows WITHOUT the trailing newline
        (build cells with :func:`copy_text_value`). Returns the
        server-reported row count.

        Protocol: Q → CopyInResponse ('G') → stream CopyData ('d')
        → CopyDone ('c') → CommandComplete → ReadyForQuery. On a
        server error before the CopyInResponse the normal error path
        applies; an error during the data stream surfaces after
        CopyDone."""
        q = sql.encode() + b"\0"
        self._sock.sendall(b"Q" + struct.pack(">i", 4 + len(q)) + q)
        err = None
        started = False
        while True:
            t, payload = self._recv_msg()
            if t == "G":  # CopyInResponse
                started = True
                break
            if t == "E":
                err = _parse_error(payload)
            elif t == "Z":
                raise PgError(err or {"M": "COPY did not start"})
        rowcount = -1
        try:
            buf = bytearray()
            for line in lines:
                buf += line.encode() + b"\n"
                if len(buf) >= 1 << 16:
                    self._sock.sendall(
                        b"d" + struct.pack(">i", 4 + len(buf)) + buf
                    )
                    buf.clear()
            if buf:
                self._sock.sendall(
                    b"d" + struct.pack(">i", 4 + len(buf)) + buf
                )
        except BaseException:
            if started:
                msg = b"client-side failure\0"
                self._sock.sendall(  # CopyFail
                    b"f" + struct.pack(">i", 4 + len(msg)) + msg
                )
                while True:
                    t, payload = self._recv_msg()
                    if t == "E":
                        pass  # expected: COPY failed
                    elif t == "Z":
                        break
            raise
        self._sock.sendall(b"c" + struct.pack(">i", 4))  # CopyDone
        while True:
            t, payload = self._recv_msg()
            if t == "C":  # "COPY n"
                tag = payload.rstrip(b"\0").decode().split()
                if tag and tag[-1].isdigit():
                    rowcount = int(tag[-1])
            elif t == "E":
                err = _parse_error(payload)
            elif t == "Z":
                break
        if err is not None:
            raise PgError(err)
        return rowcount

    def cursor(self) -> "PgWireCursor":
        return PgWireCursor(self)

    def commit(self) -> None:
        if self.in_txn:
            self._query("COMMIT")

    def rollback(self) -> None:
        if self.in_txn:
            self._query("ROLLBACK")

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack(">i", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()


class PgWireCursor:
    """DB-API cursor subset: execute with ``?`` positional parameters
    (literal-substituted — the reference stages literals the same
    way), description, rowcount, fetchone/fetchall, iteration."""

    def __init__(self, conn: PgWireConnection):
        self._conn = conn
        self.description = None
        self.rowcount = -1
        self._rows: list[tuple] = []
        self._idx = 0

    def execute(self, sql: str, params: tuple = ()) -> "PgWireCursor":
        if params:
            # naive splitter (a '?' inside a string literal would be
            # miscounted) — fine for the engine's USING PARAMETER
            # forms, which it exists for
            parts = sql.split("?")
            if len(parts) - 1 != len(params):
                raise ValueError(
                    f"{len(parts) - 1} placeholders, {len(params)} params"
                )
            out = []
            for i, p in enumerate(parts):
                out.append(p)
                if i < len(params):
                    out.append(quote_literal(params[i]))
            sql = "".join(out)
        self.description, self._rows, self.rowcount = self._conn._query(sql)
        self._idx = 0
        return self

    def fetchall(self) -> list[tuple]:
        out = self._rows[self._idx :]
        self._idx = len(self._rows)
        return out

    def fetchone(self):
        if self._idx >= len(self._rows):
            return None
        row = self._rows[self._idx]
        self._idx += 1
        return row

    def __iter__(self):
        return iter(self.fetchall())

    def close(self) -> None:
        self._rows = []

"""MS-TDS codec tests (VERDICT r7 #8) — recorded-frame round trips
for the frames the MSSQL bulk-copy path would put on the wire, the
same no-server pattern as the ws frame tests. Byte vectors are
hand-computed from the public [MS-TDS] spec (not captured from any
proprietary system)."""

from __future__ import annotations

import struct

import pytest

from analyst_spark.sources import tds


# ---------------------------------------------------------------- framing

def test_packet_header_layout():
    data = tds.encode_packets(tds.PKT_SQL_BATCH, b"abc")
    # type, status EOM, length 11 big-endian, spid 0, pkt 1, window 0
    assert data[:8] == bytes([0x01, 0x01, 0x00, 0x0B, 0x00, 0x00, 0x01, 0x00])
    assert data[8:] == b"abc"
    ptype, payload = tds.decode_packets(data)
    assert (ptype, payload) == (tds.PKT_SQL_BATCH, b"abc")


def test_packet_splitting_and_reassembly():
    payload = bytes(range(256)) * 40  # 10240 bytes > 2 packets @4096
    data = tds.encode_packets(tds.PKT_LOGIN7, payload)
    # 3 packets: 4088 + 4088 + 2064 bytes of body
    assert data[1] == 0x00 and data[4096 + 1] == 0x00
    ptype, got = tds.decode_packets(data)
    assert ptype == tds.PKT_LOGIN7 and got == payload


def test_decode_rejects_truncation_and_type_change():
    data = tds.encode_packets(tds.PKT_SQL_BATCH, b"abcdef")
    with pytest.raises(ValueError, match="truncated"):
        tds.decode_packets(data[:-2])
    two = bytearray(
        tds.encode_packets(tds.PKT_SQL_BATCH, b"x" * 5000)
    )
    two[4096] = tds.PKT_LOGIN7  # flip second packet's type byte
    with pytest.raises(ValueError, match="type changed"):
        tds.decode_packets(bytes(two))


# ---------------------------------------------------------------- PRELOGIN

def test_prelogin_round_trip():
    payload = tds.prelogin_payload(version=(12, 0, 2, 0))
    opts = tds.parse_prelogin(payload)
    assert opts[tds.PL_VERSION][:4] == bytes([12, 0, 2, 0])
    assert opts[tds.PL_ENCRYPTION] == bytes([tds.ENCRYPT_NOT_SUP])
    assert opts[tds.PL_MARS] == b"\x00"
    # table is contiguous and offsets point past the terminator
    first_off = struct.unpack(">H", payload[1:3])[0]
    assert payload[first_off - 1] == tds.PL_TERMINATOR


# ---------------------------------------------------------------- LOGIN7

def test_password_scramble_recorded_vector():
    # [MS-TDS] 2.2.6.4: swap nibbles, XOR 0xA5. For 'p' (0x70):
    # UCS-2LE bytes 70 00 -> swap: 07 00 -> xor A5: A2 A5
    assert tds.encode_password("p") == bytes([0xA2, 0xA5])
    # full word round-trips
    for pw in ("", "sa", "S3cr3t!pass", "pä€"):
        assert tds.decode_password(tds.encode_password(pw)) == pw


def test_login7_round_trip_and_fixed_header():
    lg = tds.Login7(
        hostname="client-host",
        username="sa",
        password="S3cr3t!",
        appname="analyst_spark",
        servername="dbserver",
        database="analytics",
    )
    payload = tds.login7_payload(lg)
    # self-describing length, TDS 7.4, negotiated packet size
    assert struct.unpack_from("<I", payload, 0)[0] == len(payload)
    assert struct.unpack_from("<I", payload, 4)[0] == 0x74000004
    assert struct.unpack_from("<I", payload, 8)[0] == tds.MAX_PACKET
    back = tds.parse_login7(payload)
    assert back.hostname == lg.hostname
    assert back.username == lg.username
    assert back.password == lg.password  # through the scramble
    assert back.appname == lg.appname
    assert back.servername == lg.servername
    assert back.database == lg.database
    # the password is NOT stored in the clear anywhere in the frame
    assert "S3cr3t!".encode("utf-16-le") not in payload


def test_login7_variable_block_offsets_within_frame():
    lg = tds.Login7(username="u", password="pw", database="db")
    payload = tds.login7_payload(lg)
    pos = 36
    for _ in range(9):
        off, chars = struct.unpack_from("<HH", payload, pos)
        assert off + chars * 2 <= len(payload)
        assert off >= 94  # data never points into the fixed part
        pos += 4


# ---------------------------------------------------------------- SQLBatch

def test_sql_batch_recorded_frame():
    payload = tds.sql_batch_payload("select 1", tx_descriptor=0)
    # ALL_HEADERS: total 22, one header len 18 type 0x0002, tx 0, req 1
    want_headers = struct.pack("<I", 22) + struct.pack("<IHQI", 18, 2, 0, 1)
    assert payload[:22] == want_headers
    assert payload[22:] == "select 1".encode("utf-16-le")
    sql, tx = tds.parse_sql_batch(payload)
    assert (sql, tx) == ("select 1", 0)


def test_sql_batch_carries_transaction_descriptor():
    payload = tds.sql_batch_payload("delete from t", tx_descriptor=0xDEAD)
    sql, tx = tds.parse_sql_batch(payload)
    assert (sql, tx) == ("delete from t", 0xDEAD)


# ---------------------------------------------------------------- bulk copy

COLS = [("id", "int"), ("name", "varchar(40)")]


def test_insert_bulk_statement_matches_option_assembly():
    """The `INSERT BULK` statement + BulkLoadBCP stream is what
    useBulkCopyForBatchInsert (sinks/jdbc.py) makes the driver emit —
    reference parity with engine/sql_inserter.go:79-124."""
    stmt = tds.insert_bulk_statement("dbo.events", COLS)
    assert stmt == "insert bulk dbo.events (id int, name varchar(40))"
    # and it frames as a normal SQLBatch
    sql, _ = tds.parse_sql_batch(tds.sql_batch_payload(stmt))
    assert sql == stmt


def test_bulk_colmetadata_recorded_frame():
    md = tds.bulk_colmetadata(COLS)
    assert md[0] == tds.TOK_COLMETADATA
    assert struct.unpack_from("<H", md, 1)[0] == 2
    pos = 3
    # col 1: usertype 0, flags 0x0009, INTN len 4, name 'id'
    assert struct.unpack_from("<IH", md, pos) == (0, 9)
    pos += 6
    assert md[pos] == tds.TYPE_INTN and md[pos + 1] == 4
    pos += 2
    assert md[pos] == 2 and md[pos + 1 : pos + 5] == "id".encode("utf-16-le")
    pos += 5
    # col 2: BIGVARCHAR(40) + 5-byte collation, name 'name'
    assert struct.unpack_from("<IH", md, pos) == (0, 9)
    pos += 6
    assert md[pos] == tds.TYPE_BIGVARCHAR
    assert struct.unpack_from("<H", md, pos + 1)[0] == 40
    pos += 3 + 5  # type + max len + collation
    assert md[pos] == 4
    assert md[pos + 1 : pos + 9] == "name".encode("utf-16-le")


def test_bulk_rows_and_done():
    rows = [[7, "alpha"], [None, None]]
    body = tds.bulk_load_payload("t", COLS, rows)
    # ROW 1: token, int len 4 + value, varchar len 5 + bytes
    i = len(tds.bulk_colmetadata(COLS))
    assert body[i] == tds.TOK_ROW
    assert body[i + 1] == 4
    assert struct.unpack_from("<i", body, i + 2)[0] == 7
    assert struct.unpack_from("<H", body, i + 6)[0] == 5
    assert body[i + 8 : i + 13] == b"alpha"
    # ROW 2: NULL int (len 0), NULL varchar (0xFFFF)
    j = i + 13
    assert body[j] == tds.TOK_ROW
    assert body[j + 1] == 0
    assert struct.unpack_from("<H", body, j + 2)[0] == 0xFFFF
    # DONE: status DONE_COUNT, rowcount 2
    done = body[j + 4 :]
    assert done[0] == tds.TOK_DONE
    assert struct.unpack("<HHQ", done[1:]) == (0x0010, 0, 2)


# ---------------------------------------------------------------- responses

def _us_varchar(s):
    b = s.encode("utf-16-le")
    return struct.pack("<H", len(b) // 2) + b


def _b_varchar(s):
    b = s.encode("utf-16-le")
    return bytes([len(b) // 2]) + b


def test_parse_login_response_recorded_frames():
    """A recorded-shape login response: ENVCHANGE(database) +
    LOGINACK + INFO + DONE, hand-assembled per [MS-TDS] 2.2.7."""
    env_body = bytes([1]) + _b_varchar("analytics") + _b_varchar("master")
    env = bytes([tds.TOK_ENVCHANGE]) + struct.pack("<H", len(env_body)) + env_body
    ack_body = (
        bytes([1])
        + struct.pack(">I", 0x74000004)
        + _b_varchar("Microsoft SQL Server")
        + bytes([12, 0, 2, 0])
    )
    ack = bytes([tds.TOK_LOGINACK]) + struct.pack("<H", len(ack_body)) + ack_body
    info_body = (
        struct.pack("<IBB", 5701, 2, 0)
        + _us_varchar("Changed database context to 'analytics'.")
        + _b_varchar("dbserver")
        + _b_varchar("")
        + struct.pack("<I", 1)  # line number (long since TDS 7.2)
    )
    info = bytes([tds.TOK_INFO]) + struct.pack("<H", len(info_body)) + info_body
    done = struct.pack("<BHHQ", tds.TOK_DONE, 0, 0, 0)
    toks = tds.parse_tokens(env + ack + info + done)
    kinds = [k for k, _ in toks]
    assert kinds == ["ENVCHANGE", "LOGINACK", "INFO", "DONE"]
    assert toks[0][1] == {"type": 1, "new": "analytics", "old": "master"}
    assert toks[1][1]["tds_version"] == 0x74000004
    assert toks[1][1]["prog_name"] == "Microsoft SQL Server"
    assert toks[2][1]["number"] == 5701
    assert "analytics" in toks[2][1]["message"]


def test_parse_error_response():
    err_body = (
        struct.pack("<IBB", 208, 1, 16)
        + _us_varchar("Invalid object name 'nope'.")
        + _b_varchar("dbserver")
        + _b_varchar("")
        + struct.pack("<I", 1)
    )
    err = bytes([tds.TOK_ERROR]) + struct.pack("<H", len(err_body)) + err_body
    done = struct.pack("<BHHQ", tds.TOK_DONE, 0x0002, 0, 0)  # DONE_ERROR
    toks = tds.parse_tokens(err + done)
    assert toks[0][0] == "ERROR"
    assert toks[0][1]["number"] == 208 and toks[0][1]["severity"] == 16
    assert toks[1][1]["status"] == 0x0002


def test_parse_tokens_rejects_unknown():
    with pytest.raises(ValueError, match="unexpected token"):
        tds.parse_tokens(bytes([0x42, 0, 0]))

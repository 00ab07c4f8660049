"""Round-6 hardening: regression tests for the round-5 advisor
findings (ADVICE.md) — websocket read-ahead drain, ParameterTable
C-level fast paths, per-row parameter arity, anomaly zero-variance
guard, DEDUP null-order / duplicate-key handling."""

import json
import math
import threading
import time

import pytest


# ---- ws.parse_frame: buffer-based framing ----------------------------------

def test_parse_frame_incomplete_then_complete():
    from analyst_spark import ws

    # masked client TEXT frame "hi"
    mask = b"\x01\x02\x03\x04"
    payload = bytes(b ^ mask[i % 4] for i, b in enumerate(b"hi"))
    frame = bytes([0x80 | ws.OP_TEXT, 0x80 | 2]) + mask + payload

    buf = bytearray(frame[:4])  # header+partial mask only
    assert ws.parse_frame(buf) is None
    assert len(buf) == 4  # nothing consumed on incomplete
    buf.extend(frame[4:])
    op, data = ws.parse_frame(buf)
    assert (op, data) == (ws.OP_TEXT, b"hi")
    assert buf == bytearray()


def test_parse_frame_two_frames_back_to_back():
    from analyst_spark import ws

    close = bytes([0x80 | ws.OP_CLOSE, 0x80 | 0]) + b"\x00" * 4
    ping = bytes([0x80 | ws.OP_PING, 0x80 | 0]) + b"\x00" * 4
    buf = bytearray(ping + close)
    assert ws.parse_frame(buf)[0] == ws.OP_PING
    assert ws.parse_frame(buf)[0] == ws.OP_CLOSE
    assert ws.parse_frame(buf) is None


def test_websocket_close_in_handshake_packet_is_honored():
    """The regression the advisor called out: a CLOSE frame sent in
    the SAME TCP segment as the HTTP upgrade request is read ahead
    into the handler's buffered rfile while parsing headers — so
    select() on the raw socket never reports it. The server must
    drain the rfile buffer too, and reply CLOSE promptly while the
    job is still running."""
    import base64
    import http.client
    import os
    import socket

    from analyst_spark import ws
    from analyst_spark.logging import INFO, Event
    from analyst_spark.server import AnalystServer, serve

    job_release = threading.Event()

    def runner(script, params, stopper=None, logger=None):
        logger.log(Event("B", INFO, "started"))
        job_release.wait(20)  # long-running job
        return ["ok"]

    srv = AnalystServer(script_runner=runner)
    httpd = serve(srv, port=0, tick_interval=3600)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        c.request("POST", "/run",
                  body=json.dumps({"script": "X", "detach": True}),
                  headers={"Content-Type": "application/json"})
        jid = json.loads(c.getresponse().read())["job_id"]

        key = base64.b64encode(os.urandom(16)).decode()
        mask = os.urandom(4)
        close = bytes([0x80 | ws.OP_CLOSE, 0x80 | 0]) + mask
        sock = socket.create_connection(("127.0.0.1", port), timeout=10)
        # handshake AND the CLOSE frame in one segment
        sock.sendall(
            (f"GET /jobs/{jid}/stream HTTP/1.1\r\n"
             f"Host: 127.0.0.1:{port}\r\nUpgrade: websocket\r\n"
             f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
             f"Sec-WebSocket-Version: 13\r\n\r\n").encode() + close
        )
        rfile = sock.makefile("rb")
        assert "101" in rfile.readline().decode()
        while rfile.readline().strip():
            pass  # drain response headers
        sock.settimeout(5)
        t0 = time.time()
        ops = []
        while True:
            fr = ws.recv_frame(rfile)
            if fr is None:
                break
            ops.append(fr[0])
            if fr[0] == ws.OP_CLOSE:
                break
        assert ws.OP_CLOSE in ops
        assert time.time() - t0 < 5  # prompt, not job-duration
    finally:
        job_release.set()
        httpd._analyst_stop.set()
        httpd.shutdown()


# ---- ParameterTable: C-level fast paths see display spellings ---------------

def test_parameter_table_c_level_paths_keep_display_names():
    from analyst_spark.sinks.parameter import ParameterTable

    p = ParameterTable()
    p.declare("Aa")
    p["AA"] = 3
    p["Bb"] = 4  # undeclared-store mode: first-seen spelling sticks
    # C fast paths that bypass Python overrides
    assert dict(p) == {"Aa": 3, "Bb": 4}
    assert json.loads(json.dumps(p)) == {"Aa": 3, "Bb": 4}
    assert {**p} == {"Aa": 3, "Bb": 4}
    assert set(p.keys()) == {"Aa", "Bb"}


def test_parameter_table_copy_and_update_canonicalize():
    from analyst_spark.sinks.parameter import ParameterTable

    p = ParameterTable()
    p["Aa"] = 1
    q = p.copy()
    assert isinstance(q, ParameterTable)
    q["AA"] = 2           # same slot through the copy's index
    assert q["aa"] == 2 and p["aa"] == 1 and dict(q) == {"Aa": 2}
    p.update({"aA": 9, "Cc": 7})  # update() routes through _canon
    assert dict(p) == {"Aa": 9, "Cc": 7}
    p.pop("AA")
    assert "aa" not in p and dict(p) == {"Cc": 7}
    with pytest.raises(KeyError):
        p.pop("missing")
    assert p.pop("missing", "dflt") == "dflt"
    del p["CC"]
    assert dict(p) == {}


# ---- parameter_sink: per-row arity in both directions -----------------------

def test_parameter_sink_rejects_wider_rows(spark):
    from analyst_spark.sinks.parameter import parameter_sink

    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="1 parameters declared"):
        parameter_sink(df, ["@x"], {})


def test_parameter_sink_rejects_early_malformed_row(spark):
    from analyst_spark.sinks.parameter import parameter_sink

    # engine/parameters.go:100-108 checks EVERY row's arity, so a
    # malformed first row fails even when the last row is fine
    df = spark.createDataFrame(
        [(1, None), (3, 4)], ["a", "b"]
    ).coalesce(1)
    with pytest.raises(ValueError, match="2 parameters"):
        parameter_sink(df.selectExpr("a"), ["@x", "@y"], {})
    # happy path unchanged
    out = parameter_sink(df, ["@x", "@y"], {})
    assert out["x"] == 3 and out["y"] == 4


# ---- events_anomaly_zscore: zero-variance groups excluded -------------------

def test_anomaly_zscore_zero_variance_group_is_excluded(spark, tmp_path):
    import datetime

    from analyst_spark.plans.analytics_plans import events_anomaly_zscore

    ts = datetime.datetime(2024, 1, 1)
    rows = (
        # constant-valued group: would be z = 0/0 = NaN unguarded
        [(i, ts, 1, "constant", 5.0, "{}") for i in range(10)]
        # varied group with one clear outlier
        + [(100 + i, ts, 1, "varied", 10.0 + (i % 3) * 0.01, "{}")
           for i in range(30)]
        + [(999, ts, 1, "varied", 10000.0, "{}")]
    )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_anomaly_zscore(spark, str(tmp_path)).collect()
    assert out, "the varied-group outlier must be flagged"
    assert all(r.event_type == "varied" for r in out)
    assert all(not math.isnan(r.zscore) for r in out)
    assert any(r.event_id == 999 for r in out)


# ---- DEDUP: duplicate keys collapse; NULL order fails loudly ----------------

def test_dedup_duplicate_keys_collapse(spark):
    from analyst_spark.aql.transforms_parser import build_dedup, parse_dedup

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], ["id", "k", "v"]
    )
    out = build_dedup(df, parse_dedup("DEDUP ON k, K KEEP LAST BY id"))
    assert out.columns.count("k") == 1
    assert [tuple(r) for r in out.collect()] == [("a", 2, 20)] or \
        {(r.k, r.id, r.v) for r in out.collect()} == {("a", 2, 20)}


def test_dedup_null_order_value_raises(spark):
    from analyst_spark.aql.transforms_parser import build_dedup, parse_dedup

    df = spark.createDataFrame(
        [(1, "a", 10), (None, "a", 20)],
        "id int, k string, v int",
    )
    out = build_dedup(df, parse_dedup("DEDUP ON k KEEP FIRST BY id"))
    with pytest.raises(Exception, match="DEDUP order column"):
        out.collect()

"""Subprocess JSON-RPC plugins — the reference's plugin protocol,
byte-compatible (plugins/api.go, transform_rpc.go, source_rpc.go,
destination_rpc.go).

A reference plugin is ANY executable speaking line-delimited JSON-RPC
over stdio (Go side: natefinch/pie with the net/rpc jsonrpc codec):
requests are ``{"method": m, "params": [arg], "id": n}``, responses
``{"id": n, "result": ..., "error": ...}``. Methods: ``set_option``,
``set_sources``, ``set_destinations``, ``set_input_columns``,
``get_output_columns``, and ``receive`` (a nil-params ``receive`` is
the EOS signal; a source plugin is polled with ``receive`` until it
returns no rows). A user's existing plugin script runs unmodified.

Spark mapping: the plugin is a single OS process by construction —
exactly as it is in the reference — so rows funnel through the driver
(collect → batches → subprocess → createDataFrame). This is the
compatibility path; the SCALE path for custom Python logic is the
in-plan Arrow surface (sources/plugin.py python_transform via
mapInPandas), which distributes across executors. Both register the
same way in AQL scripts; choose by workload.
"""

from __future__ import annotations

import json
import subprocess
from pyspark.sql import DataFrame, SparkSession

BATCH_ROWS = 500  # engine DefaultRowsPerBatch scale (sql_dest.go:26)


class PluginError(RuntimeError):
    pass


class _RPCClient:
    """Line-delimited JSON-RPC 1.0 over a child process's stdio, the
    net/rpc jsonrpc codec's wire format."""

    def __init__(self, path: str, args: list[str] | None = None):
        self.path, self.args = path, list(args or [])
        self.proc: subprocess.Popen | None = None
        self._id = 0

    def dial(self) -> None:
        self.proc = subprocess.Popen(
            [self.path, *self.args],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=None,  # plugin stderr passes through, like pie
            text=True,
        )

    def call(self, method: str, param) -> object:
        if self.proc is None or self.proc.poll() is not None:
            raise PluginError(f"plugin {self.path} is not running")
        self._id += 1
        req = {"method": method, "params": [param], "id": self._id}
        try:
            self.proc.stdin.write(json.dumps(req) + "\n")
            self.proc.stdin.flush()
            line = self.proc.stdout.readline()
        except (BrokenPipeError, OSError) as e:
            raise PluginError(f"plugin {self.path} pipe failed: {e}") from e
        if not line:
            raise PluginError(f"plugin {self.path} exited mid-call ({method})")
        resp = json.loads(line)
        if resp.get("error"):
            raise PluginError(f"plugin {method} error: {resp['error']}")
        return resp.get("result")

    def close(self) -> None:
        if self.proc is not None:
            try:
                self.proc.stdin.close()
            except OSError:
                pass
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self.proc.kill()
            self.proc = None


class _PluginBase:
    """Shared option/column setup calls (plugins/api.go Plugin)."""

    def __init__(self, path: str, args: list[str] | None = None):
        self._c = _RPCClient(path, args)

    def dial(self) -> None:
        self._c.dial()

    def close(self) -> None:
        self._c.close()

    def set_option(self, name: str, value) -> None:
        self._c.call("set_option", {"name": name, "value": value})

    def set_sources(self, names: list[str]) -> None:
        self._c.call("set_sources", names)

    def set_destinations(self, names: list[str]) -> None:
        self._c.call("set_destinations", names)

    def set_input_columns(self, source: str, columns: list[str]) -> None:
        self._c.call("set_input_columns", {"source": source, "columns": columns})

    def get_output_columns(self) -> dict[str, list[str]]:
        return self._c.call("get_output_columns", None) or {}

    @staticmethod
    def _parse_output(result) -> tuple[list[dict], list[dict]]:
        result = result or {}
        return result.get("rows") or [], result.get("logs") or []


class TransformJSONRPC(_PluginBase):
    def send(self, rows: list[dict]) -> tuple[list[dict], list[dict]]:
        return self._parse_output(self._c.call("receive", rows))

    def eos(self) -> tuple[list[dict], list[dict]]:
        return self._parse_output(self._c.call("receive", None))


class SourceJSONRPC(_PluginBase):
    def receive(self) -> tuple[list[dict], list[dict]]:
        return self._parse_output(self._c.call("receive", None))


class DestinationJSONRPC(_PluginBase):
    def send(self, rows: list[dict]) -> list[dict]:
        return self._parse_output(self._c.call("receive", rows))[1]

    def eos(self) -> list[dict]:
        return self._parse_output(self._c.call("receive", None))[1]


def _frames_from_rows(
    spark: SparkSession, rows: list[dict], out_cols: dict[str, list[str]]
) -> dict[str, DataFrame]:
    """Route OutputRows by their destination label and build one
    DataFrame per destination ('' / '*' = every declared one, the
    multiplexer wildcard — plugins/api.go OutputRow)."""
    dests = [d for d in out_cols if d not in ("", "*")] or [""]
    wildcard_cols = out_cols.get("*") or out_cols.get("")
    by_dest: dict[str, list] = {d: [] for d in dests}
    for r in rows:
        target = r.get("destination") or ""
        data = tuple(r.get("data") or [])
        if target in by_dest:
            by_dest[target].append(data)
        else:  # unlabeled or wildcard row → every destination
            for d in dests:
                by_dest[d].append(data)
    out = {}
    for d in dests:
        cols = out_cols.get(d) or wildcard_cols
        if not cols:
            raise PluginError(f"plugin declared no columns for {d!r}")
        if by_dest[d]:
            out[d] = spark.createDataFrame(by_dest[d], schema=cols)
        else:
            # names-only schema can't be inferred from zero rows; a
            # declared destination with no output is still an empty
            # frame, not a crash (all-string, like empty SQL results)
            from pyspark.sql.types import StringType, StructField, StructType

            out[d] = spark.createDataFrame(
                [], StructType([StructField(c, StringType()) for c in cols])
            )
    return out


def run_transform_plugin(
    spark: SparkSession,
    inputs: dict[str, DataFrame],
    path: str,
    args: list[str] | None = None,
    options: dict | None = None,
    batch_rows: int = BATCH_ROWS,
) -> dict[str, DataFrame]:
    """Run input frames through a subprocess transform plugin
    (transform.go Open): set options/sources/columns, stream batches
    tagged with their source name, EOS, collect routed outputs.
    Sources stream sequentially in dict order (MULTISOURCE_ORDER =
    Sequential semantics)."""
    p = TransformJSONRPC(path, args)
    p.dial()
    try:
        for k, v in (options or {}).items():
            p.set_option(str(k), v)
        p.set_sources(list(inputs))
        out_cols = p.get_output_columns()
        p.set_destinations([d for d in out_cols if d not in ("", "*")])
        all_rows: list[dict] = []
        for name, df in inputs.items():
            p.set_input_columns(name, df.columns)
            batch: list[dict] = []
            for row in df.toLocalIterator():
                batch.append({"source": name, "data": list(row)})
                if len(batch) >= batch_rows:
                    rows, _ = p.send(batch)
                    all_rows.extend(rows)
                    batch = []
            if batch:
                rows, _ = p.send(batch)
                all_rows.extend(rows)
        rows, _ = p.eos()
        all_rows.extend(rows)
        return _frames_from_rows(spark, all_rows, out_cols)
    finally:
        p.close()


def run_source_plugin(
    spark: SparkSession,
    path: str,
    args: list[str] | None = None,
    options: dict | None = None,
) -> dict[str, DataFrame]:
    """Poll a source plugin until it signals EOS by returning no rows
    (source.go:107-110)."""
    p = SourceJSONRPC(path, args)
    p.dial()
    try:
        for k, v in (options or {}).items():
            p.set_option(str(k), v)
        out_cols = p.get_output_columns()
        p.set_destinations([d for d in out_cols if d not in ("", "*")])
        all_rows: list[dict] = []
        while True:
            rows, _ = p.receive()
            if not rows:
                break
            all_rows.extend(rows)
        return _frames_from_rows(spark, all_rows, out_cols)
    finally:
        p.close()


def run_destination_plugin(
    df: DataFrame,
    path: str,
    args: list[str] | None = None,
    options: dict | None = None,
    source_name: str = "main",
    batch_rows: int = BATCH_ROWS,
) -> int:
    """Stream a frame into a destination plugin; returns rows sent."""
    p = DestinationJSONRPC(path, args)
    p.dial()
    try:
        for k, v in (options or {}).items():
            p.set_option(str(k), v)
        p.set_sources([source_name])
        p.set_input_columns(source_name, df.columns)
        n = 0
        batch: list[dict] = []
        for row in df.toLocalIterator():
            batch.append({"source": source_name, "data": list(row)})
            n += 1
            if len(batch) >= batch_rows:
                p.send(batch)
                batch = []
        if batch:
            p.send(batch)
        p.eos()
        return n
    finally:
        p.close()

"""Console destination (engine/console_dest.go:14-105).

Two output formats with golden-output parity (the reference's e2e
tests compare console JSON byte-for-byte — compiler_test.go:58-83):

* ``json``  — a JSON array of objects, keys = column names.
* ``table`` — ASCII table (tablewriter-style box drawing).

Collect-to-driver is inherent to a console sink; the caller bounds
the row count (same constraint as the reference, which buffered all
rows in memory before rendering).
"""

from __future__ import annotations

import io
import json
import sys
from datetime import datetime

from pyspark.sql import DataFrame


def _cell_json(v):
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        # Go's encoding/json prints float64 3.0 as "3" — required for
        # byte-parity with the reference's golden console output
        # (compiler_test.go:80: `[{"Total":3}]`).
        return int(v)
    return v


def render_json(df: DataFrame) -> str:
    rows = df.collect()
    return json.dumps(
        [{c: _cell_json(r[c]) for c in df.columns} for r in rows],
        default=str,
        separators=(",", ":"),
    )


def render_table(df: DataFrame) -> str:
    rows = [[("" if r[c] is None else str(r[c])) for c in df.columns] for r in df.collect()]
    widths = [
        max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
        for i, h in enumerate(df.columns)
    ]
    out = io.StringIO()

    def line(ch="-"):
        out.write("+" + "+".join(ch * (w + 2) for w in widths) + "+\n")

    def row(cells):
        out.write(
            "|" + "|".join(f" {c:<{w}} " for c, w in zip(cells, widths)) + "|\n"
        )

    line()
    row(df.columns)
    line("=")
    for r in rows:
        row(r)
    line()
    return out.getvalue()


def console_sink(
    df: DataFrame, output_format: str = "table", writer=None
) -> str:
    """Render and write (default stderr, like the reference); returns
    the rendered string so tests can golden-compare."""
    text = render_json(df) if output_format.lower() == "json" else render_table(df)
    (writer or sys.stderr).write(text + ("\n" if not text.endswith("\n") else ""))
    return text

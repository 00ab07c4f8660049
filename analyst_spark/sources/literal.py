"""DATA-block literal source (engine/literal_source.go:25-176).

Three formats, with the reference's exact semantics:

* ``JSON_ARRAY``   — ``[[1,"a"], [2,"b"]]`` positional rows.
* ``JSON_OBJECTS`` — ``[{"a":1}, ...]``, keys matched to COLUMNS
  case-insensitively, missing keys → NULL, extra keys dropped.
* ``CSV``          — headerless; every cell is a STRING (the
  documented all-strings semantics).

Literal data is driver-resident by definition; ``createDataFrame``
parallelizes it. Type unification improves on the reference's
first-row inference (SURVEY §1.2): a NULL in the first row is not an
error here — the whole column is scanned for the first non-null.
"""

from __future__ import annotations

import csv as _csv
import io
import json
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _unify_type(values: list) -> T.DataType:
    """Unify over ALL values, not just the first non-null: mixed
    int/float → double, anything incompatible → string (cells are
    stringified in _frame). Improves on the reference's first-row
    CREATE inference (engine/auto_sql_transform.go:86-128)."""
    kinds = set()
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        elif isinstance(v, datetime):
            kinds.add("ts")
        else:
            kinds.add("str")
    if kinds == {"bool"}:
        return T.BooleanType()
    if kinds == {"int"}:
        return T.LongType()
    if kinds and kinds <= {"int", "float"}:
        return T.DoubleType()
    if kinds == {"ts"}:
        return T.TimestampType()
    return T.StringType()


def _frame(spark: SparkSession, rows: list[list], columns: list[str]) -> DataFrame:
    cols = list(zip(*rows)) if rows else [[] for _ in columns]
    fields = [
        T.StructField(name, _unify_type(list(vals)), True)
        for name, vals in zip(columns, cols)
    ]

    def norm(v, dt):
        if v is None:
            return None
        if isinstance(dt, T.DoubleType):
            return float(v)
        if isinstance(dt, T.StringType) and not isinstance(v, str):
            return str(v)
        return v

    norm_rows = [
        [norm(v, f.dataType) for v, f in zip(r, fields)] for r in rows
    ]
    return spark.createDataFrame(norm_rows, T.StructType(fields))


def literal_source(
    spark: SparkSession,
    content: str,
    columns: list[str],
    fmt: str = "JSON_ARRAY",
) -> DataFrame:
    fmt = fmt.upper()
    if fmt == "JSON_ARRAY":
        data = json.loads(content)
        rows = [list(r) for r in data]
        if any(len(r) != len(columns) for r in rows):
            raise ValueError("JSON_ARRAY row width != COLUMNS width")
        return _frame(spark, rows, columns)
    if fmt == "JSON_OBJECTS":
        data = json.loads(content)
        rows = []
        for obj in data:
            lower = {k.lower(): v for k, v in obj.items()}
            rows.append([lower.get(c.lower()) for c in columns])
        return _frame(spark, rows, columns)
    if fmt == "CSV":
        # Bodies arrive indented inside AQL scripts; strip per-line
        # leading whitespace (Go csv.Reader TrimLeadingSpace analog).
        content = "\n".join(l.strip() for l in content.strip().splitlines())
        reader = _csv.reader(io.StringIO(content))
        rows = [[cell for cell in line] for line in reader if line]
        if any(len(r) != len(columns) for r in rows):
            raise ValueError("CSV row width != COLUMNS width")
        schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in columns]
        )
        return spark.createDataFrame(rows, schema)
    raise ValueError(f"unknown literal format {fmt!r}")

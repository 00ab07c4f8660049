"""TEST-block assertions (aql/assertions.go:10-57 grammar;
engine/condition.go:50-167 conditions) evaluated on DataFrames.

  IT OUTPUTS {AT LEAST|AT MOST|EXACTLY} N ROWS
  COLUMN c HAS {AT LEAST|AT MOST|EXACTLY} N DISTINCT VALUES
  COLUMN c HAS UNIQUE VALUES
  COLUMN c HAS NO NULL VALUES
  IT SATISFIES <row expression>

Row expressions run through F.expr — a strict superset of the
reference's qlbridge SQL-ish dialect for the constructs its docs use.
Every check is a limit-1 probe where possible (null/unique/satisfies)
so a failing assertion on 100 TB doesn't scan the world.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class AssertionFailure(AssertionError):
    message: str

    def __str__(self):
        return self.message


_PATTERNS = [
    ("rows", re.compile(
        r"^IT\s+OUTPUTS\s+(AT\s+LEAST|AT\s+MOST|EXACTLY)\s+(\d+)\s+ROWS?$", re.I)),
    ("distinct", re.compile(
        r"^COLUMN\s+(\w+)\s+HAS\s+(AT\s+LEAST|AT\s+MOST|EXACTLY)\s+(\d+)\s+DISTINCT\s+VALUES?$", re.I)),
    ("unique", re.compile(r"^COLUMN\s+(\w+)\s+HAS\s+UNIQUE\s+VALUES?$", re.I)),
    ("nonull", re.compile(r"^COLUMN\s+(\w+)\s+HAS\s+NO\s+NULL\s+VALUES?$", re.I)),
    ("satisfies", re.compile(r"^IT\s+SATISFIES\s+(.+)$", re.I | re.S)),
]


def parse_assertions(body: str) -> list[tuple[str, tuple]]:
    out = []
    for raw in body.split(";"):
        stmt = " ".join(raw.split())
        if not stmt:
            continue
        for kind, pat in _PATTERNS:
            m = pat.match(stmt)
            if m:
                out.append((kind, m.groups()))
                break
        else:
            raise SyntaxError(f"unrecognized assertion {stmt!r}")
    return out


def _cmp(op: str, actual: int, expected: int) -> bool:
    op = " ".join(op.upper().split())
    if op == "AT LEAST":
        return actual >= expected
    if op == "AT MOST":
        return actual <= expected
    return actual == expected


def check_assertions(name: str, df: DataFrame, body: str) -> None:
    """Raises AssertionFailure on the first failing assertion (the
    reference stops the job on first failure)."""
    for kind, groups in parse_assertions(body):
        if kind == "rows":
            op, n = groups
            actual = df.count()
            if not _cmp(op, actual, int(n)):
                raise AssertionFailure(
                    f"{name}: expected {op.lower()} {n} rows, got {actual}")
        elif kind == "distinct":
            col, op, n = groups
            actual = df.select(F.countDistinct(col)).collect()[0][0]
            if not _cmp(op, actual, int(n)):
                raise AssertionFailure(
                    f"{name}: column {col}: expected {op.lower()} {n} "
                    f"distinct values, got {actual}")
        elif kind == "unique":
            (col,) = groups
            dup = (
                df.groupBy(col).count().filter(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise AssertionFailure(
                    f"{name}: column {col} has duplicate values")
        elif kind == "nonull":
            (col,) = groups
            nulls = df.filter(F.col(col).isNull()).limit(1).count()
            if nulls:
                raise AssertionFailure(f"{name}: column {col} has NULL values")
        elif kind == "satisfies":
            (expr,) = groups
            bad = df.filter(~F.expr(expr)).limit(1).count()
            if bad:
                raise AssertionFailure(
                    f"{name}: row fails SATISFIES {expr!r}")

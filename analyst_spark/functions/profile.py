"""Single-pass data profiling (the Deequ / Great-Expectations
analyzer shape) over ANY DataFrame: per column — row count, null
count, completeness in exact ppm, distinct count (exact or HLL), and
engine-exact min/max representations.

A profile is driven by a column SPEC list ``[(name, kind), ...]``
with kinds:

- ``int``:       min/max cast to string verbatim (exact digits)
- ``cents``:     2-decimal doubles rendered through the exact
                 integer-cents device (no float-to-string)
- ``timestamp``: rendered through a pinned format string
- ``string``:    identity

``profile_oracle(specs, table)`` generates the matching DuckDB SQL
from the SAME spec list (repo convention: shared parameters cannot
drift), so any profiled table hash-gates.

Scale: null counts / completeness / min / max are map-side-combined
aggregates — scan-bandwidth-bound at any size. EXACT distinct counts
are the one expensive metric: Spark plans multi-column
count(distinct) via Expand (one duplicated row stream per distinct
column) — the honest cost of exactness at gate scale. At 100 TB
profile with ``approx=True``: approx_count_distinct keeps the whole
profile a single pass of mergeable fixed-size HLL sketches with NO
Expand (plan shape pinned in tests/test_profile.py).

No analog in the reference — its AGGREGATE grammar profiles one
column per block (docs/aggregate.md); this is the engine-level
whole-table form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Spec = Sequence[tuple[str, str]]


def _render_spark(col: str, kind: str, agg: str) -> str:
    if kind == "int":
        return f"CAST({agg}({col}) AS STRING)"
    if kind == "cents":
        return f"CAST(CAST(round({agg}({col}) * 100) AS BIGINT) AS STRING)"
    if kind == "timestamp":
        return f"date_format({agg}({col}), 'yyyy-MM-dd HH:mm:ss')"
    return f"{agg}({col})"


def _render_duck(col: str, kind: str, agg: str) -> str:
    if kind == "int":
        return f"CAST({agg}({col}) AS VARCHAR)"
    if kind == "cents":
        return f"CAST(CAST(round({agg}({col}) * 100) AS BIGINT) AS VARCHAR)"
    if kind == "timestamp":
        return f"strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')"
    return f"{agg}({col})"


def profile_table(
    df: DataFrame, specs: Spec, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """Profile ``df`` per ``specs`` in ONE aggregation job over one
    scan; the long-format result is a stack() of the wide row.
    Output: (col_name, n_rows, n_null, completeness_ppm, n_distinct,
    min_repr, max_repr). ``rsd`` is the HLL relative standard
    deviation used when ``approx=True`` (Spark default 0.05; the
    gate-checked catalog entry pins 0.01 so its 5-sigma band is
    +/-5%)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in specs:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__nd_{c}"))
        else:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.expr(_render_spark(c, kind, "min")).alias(f"__mn_{c}"))
        aggs.append(F.expr(_render_spark(c, kind, "max")).alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c, _ in specs
    )
    long = wide.select(
        "n_rows",
        F.expr(
            f"stack({len(specs)}, {stack_args}) AS "
            "(col_name, __nn, n_distinct, min_repr, max_repr)"
        ),
    )
    return long.select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("__nn")).cast("long").alias("n_null"),
        F.expr(
            "CASE WHEN n_rows = 0 THEN NULL "
            "ELSE (__nn * 1000000) DIV n_rows END"
        ).alias("completeness_ppm"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_repr",
        "max_repr",
    )


def profile_oracle(specs: Spec, table: str) -> str:
    """The DuckDB twin of :func:`profile_table` for the same specs."""
    parts = []
    for c, kind in specs:
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       count(*) AS n_rows,
       count(*) - count({c}) AS n_null,
       CASE WHEN count(*) = 0 THEN NULL
            ELSE (count({c}) * 1000000) // count(*) END
           AS completeness_ppm,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {_render_duck(c, kind, "min")} AS min_repr,
       {_render_duck(c, kind, "max")} AS max_repr
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)

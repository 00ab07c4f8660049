"""Distributed as-of join — a time-series operator Spark lacks as a
builtin and the reference cannot express at all (its one join is an
equi-only hash lookup, transforms/lookup.go:22-40; SURVEY §2.3).

Semantics (``backward``, the common case): for every left row, attach
the value columns of the LATEST right row with ``right.ts <= left.ts``
within the same ``by`` key group; unmatched left rows keep NULLs
(left-outer flavor).

Implementation is the canonical scalable formulation — NOT a range
cross-join: union both sides, then one window per key group does a
cumulative forward-fill of right-side values. Cost = one shuffle on
the key columns + an in-partition sort, identical asymptotics to a
sort-merge join; no candidate-pair explosion regardless of time-range
width. Ties at equal ts resolve deterministically: right rows sort
before left rows (<= semantics) and among right rows the greatest
value-column tuple wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: list[str],
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; output = all left columns + one
    ``<value_col><suffix>`` per right value column."""
    out_cols = list(left.columns)
    l = left.withColumn("__side", F.lit(1))
    r = right.select(*by_cols, ts_col, *value_cols).withColumn(
        "__side", F.lit(0)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    order = [
        F.col(ts_col).asc(),
        F.col("__side").asc(),
        F.struct(*value_cols).asc_nulls_first(),
    ]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward-fill ONE struct of all value columns so a tie at
    # (key, ts) resolves to a single whole right row — independent
    # per-column fills could mix columns from different tied rows.
    fill = F.last(
        F.when(F.col("__side") == 0, F.struct(*value_cols)),
        ignorenulls=True,
    ).over(w).alias("__vals")
    return (
        u.select(*u.columns, fill)
        .filter(F.col("__side") == 1)
        .select(
            *out_cols,
            *[F.col(f"__vals.{c}").alias(c + suffix) for c in value_cols],
        )
    )

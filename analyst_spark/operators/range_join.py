"""Distributed range join (interval / time-window join) — like the
as-of join, a shape the reference cannot express (equi-only LOOKUP,
SURVEY §2.3) and Spark has no dedicated operator for.

Naive formulation ``L join R on key AND r.ts BETWEEN l.ts-w AND l.ts``
gives Catalyst only the equi-key; within hot keys the inequality is a
nested-loop filter — O(|L_k|·|R_k|) per key, quadratic blowup on hot
keys at 100 TB. The scalable form BUCKETIZES time: both sides bin to
``floor(ts/w)``; a right row can only match left rows in its own or
the next bin, so joining on (key, bin) with the right side exploded
to 2 bins makes the join an ordinary equi-join — shuffle keyed by
(key, bin), candidate sets bounded by bin population, exact result
after the residual range filter. This is the standard pattern behind
dedicated range-join implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    by_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_s: int = 300,
    count_col: str = "n_in_range",
) -> DataFrame:
    """For every left row, count right rows with the same key whose
    timestamp falls in ``(left.ts - window_s, left.ts]``. Returns all
    left columns + the count (0 when none — left-outer semantics).

    Left rows must be unique as tuples (carry a unique id column):
    the final per-left-row aggregation groups by all left columns,
    so exact duplicates would merge and double-count.
    """
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))
    l = left.withColumn("__bin", F.floor(lsec / window_s))
    # a right row at bin b can match left rows in bins b and b+1
    r = (
        right.select(*by_cols, rsec.alias("__rsec"))
        .withColumn(
            "__bin",
            F.explode(
                F.array(
                    F.floor(F.col("__rsec") / window_s),
                    F.floor(F.col("__rsec") / window_s) + 1,
                )
            ),
        )
    )
    joined = l.join(r, on=[*by_cols, "__bin"], how="left")
    in_range = (
        (F.col("__rsec") > lsec - window_s) & (F.col("__rsec") <= lsec)
    )
    group_cols = [c for c in left.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0))
            .cast("long")
            .alias(count_col)
        )
    )

"""ZOH — zero-order-hold time-weighted mean over ``[start, finish)``.

Re-expression of the reference's ``Timeseries.Mean``
(transforms/zoh.go:175-236) as a window + conditional-weight
aggregation — no UDF, fully Catalyst-visible, shuffles once on the
group keys and scales linearly.

Reference semantics reproduced exactly:

* ``finish <= start`` → NULL (zoh.go:177-179).
* The series must have a point at or before ``start`` — the held value
  enters the interval from the last point <= start; otherwise NULL
  (zoh.go:180-182).
* Each point's value holds until the next point; the last point before
  ``finish`` holds to ``finish``; intervals are clamped to
  ``[start, finish]`` and may be zero-length (zoh.go:205-229).
* Result = sum(value * interval) / (finish - start).

Formulation: for each point ``t_i`` let ``nxt = lead(t)`` over the
group ordered by time (default = finish). Then

    w_i = greatest(0, least(nxt, finish) - greatest(t_i, start))

and the mean is ``sum(v*w)/sum(w)``: points entirely before ``start``
or at/after ``finish`` get w=0, the last point <= start gets exactly
the lead-in weight ``min(nxt, finish) - start``, and sum(w) equals
``finish - start`` whenever the NULL-conditions don't apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zoh_mean(
    df: DataFrame,
    group_by: Sequence[str],
    time_col: str,
    value_col: str,
    start: str,
    finish: str,
    alias: str = "zoh",
) -> DataFrame:
    """Time-weighted ZOH mean per group. ``time_col`` may be a
    timestamp column or an RFC3339 string column (the reference carries
    times as strings — transforms/common.go:13-31)."""
    t = F.to_timestamp(F.col(time_col)).cast("double")
    v = F.col(value_col).cast("double")
    s = F.to_timestamp(F.lit(start)).cast("double")
    e = F.to_timestamp(F.lit(finish)).cast("double")

    w_spec = Window.partitionBy(*[F.col(c) for c in group_by]).orderBy(t)
    nxt = F.lead(t).over(w_spec)
    nxt = F.coalesce(nxt, e)
    weight = F.greatest(F.least(nxt, e) - F.greatest(t, s), F.lit(0.0))

    pts = df.select(
        *group_by,
        t.alias("__t"),
        v.alias("__v"),
        weight.alias("__w"),
    )

    agg = pts.groupBy(*group_by).agg(
        (F.sum(F.col("__v") * F.col("__w")) / F.sum("__w")).alias("__mean"),
        F.min("__t").alias("__tmin"),
    )
    # NULL rules: series starting after `start`, or an empty interval.
    valid = (F.col("__tmin") <= s) & (e > s)
    return agg.select(
        *group_by,
        F.when(valid, F.col("__mean")).alias(alias),
    )

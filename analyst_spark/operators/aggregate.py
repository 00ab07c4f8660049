"""AGGREGATE — the reference's native group-by engine, Spark-first.

The reference (transforms/aggregate.go) implements a single-pass
streaming hash aggregation with 8 reducers (SUM AVG MIN MAX COUNT
QUANTILE CDF ZOH) whose state lives in one in-process map (no spill,
no partial aggregation). Here every reducer maps to a Catalyst
aggregate expression, so partial (map-side) aggregation, spilling,
whole-stage codegen and AQE-coalesced shuffles all apply for free —
this is the scale story: a groupBy on 100 TB does map-side combine
before the shuffle, which the reference's design fundamentally cannot.

Semantics notes vs the reference:

* All reducer outputs are DOUBLE (the reference returns ``*float64``
  for everything — transforms/aggregate.go:238-246).
* ``COUNT`` in the reference is buggy (transforms/count.go:22-31:
  never sets notNull, Copy() returns a sum reducer). We implement the
  *intended* SQL COUNT semantics, per SURVEY §2.4's adjudication.
* ``MIN``/``MAX`` accept either numbers or RFC3339 time-strings; the
  time-string form yields float epoch seconds
  (transforms/min.go:44-49). Use ``min_time_epoch``/``max_time_epoch``
  for that form.
* ``QUANTILE`` uses t-digest in the reference; we expose the exact
  ``percentile`` (oracle-matchable) and ``approx`` t-digest-class
  ``percentile_approx`` for the 100 TB path.
* ``CDF(x, v)`` — empirical P(X <= v) — has no builtin; the exact
  ``avg(x <= v)`` formulation is one expression and matches the
  t-digest estimate asymptotically (SURVEY §2.4).
* ``ZOH`` is in :mod:`analyst_spark.operators.zoh` (needs a window
  pre-pass, not a plain aggregate expression).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sum(col: str) -> Column:
    return F.sum(F.col(col).cast("double"))


def _avg(col: str) -> Column:
    return F.avg(F.col(col).cast("double"))


def _min(col: str) -> Column:
    return F.min(F.col(col).cast("double"))


def _max(col: str) -> Column:
    return F.max(F.col(col).cast("double"))


def _count(col: str) -> Column:
    # Reference grammar has no COUNT(*); users write COUNT(1) with a
    # literal arg (docs/transforms.md). Arg is ignored, rows counted.
    return F.count(F.lit(1)).cast("double")


def quantile(
    col: str,
    q: float | list[float],
    approx: bool = False,
    accuracy: int | None = None,
) -> Column:
    """QUANTILE(x, q). exact percentile by default (oracle-parity);
    ``approx=True`` switches to percentile_approx — the same
    approximation class as the reference's t-digest
    (transforms/quantile.go:8-14) and the right choice at 100 TB.

    ``accuracy`` (approx only; default Spark's 10000) sets the GK
    sketch's rank-error bound ε = 1/accuracy. When accuracy ≥ 2 ×
    the largest group's row count, ε·n < 0.5 < 1 and the sketch
    provably returns the EXACT element at the target rank — the
    deterministic configuration the driver gate hashes (VERDICT r10
    #8); the sketch build/merge path is exercised either way.

    Pass a list of qs to share ONE aggregation state across all of
    them (exact percentile buffers every value per state — n quantiles
    as separate aggs cost n copies of that buffer, ~2x wall time for
    two qs at sf0.1)."""
    if accuracy is not None and not approx:
        raise ValueError(
            "accuracy only applies to the approx sketch; pass "
            "approx=True (the exact percentile has no accuracy knob)"
        )
    if isinstance(q, (list, tuple)):
        qs = F.array(*[F.lit(float(x)) for x in q])
    else:
        qs = F.lit(float(q))
    if approx:
        if accuracy is not None:
            return F.percentile_approx(
                F.col(col).cast("double"), qs, F.lit(int(accuracy))
            )
        return F.percentile_approx(F.col(col).cast("double"), qs)
    return F.percentile(F.col(col).cast("double"), qs)


def cdf(col: str, v: float) -> Column:
    """CDF(x, v): empirical P(X <= v); exact one-pass formulation."""
    x = F.col(col).cast("double")
    return F.avg(F.when(x.isNull(), None).when(x <= v, 1.0).otherwise(0.0))


def min_time_epoch(col: str) -> Column:
    """MIN over RFC3339 time-strings → float epoch seconds
    (transforms/min.go:44-49). Parse via timestamp cast — it accepts
    all three layouts the reference does (transforms/common.go:13-31,
    all ISO-8601-shaped); unix_timestamp's default format does not."""
    return F.min(F.unix_timestamp(F.col(col).try_cast("timestamp"))).cast("double")


def max_time_epoch(col: str) -> Column:
    return F.max(F.unix_timestamp(F.col(col).try_cast("timestamp"))).cast("double")


REDUCERS = {
    "SUM": _sum,
    "AVG": _avg,
    "MIN": _min,
    "MAX": _max,
    "COUNT": _count,
}


def aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    aggs: Sequence[tuple[str, str, str]] | Sequence[Column],
) -> DataFrame:
    """``AGGREGATE term AS alias ... GROUP BY cols`` as a DataFrame op.

    ``aggs`` entries are either prebuilt aliased Columns or
    ``(reducer_name, column, alias)`` triples for the simple reducers.
    With an empty ``group_by`` a single global group is produced, like
    the reference's NoGroupBy key (transforms/aggregate.go:62-63).
    """
    exprs = []
    for a in aggs:
        if isinstance(a, Column):
            exprs.append(a)
        else:
            name, col, alias = a
            exprs.append(REDUCERS[name.upper()](col).alias(alias))
    if group_by:
        return df.groupBy(*group_by).agg(*exprs)
    return df.agg(*exprs)

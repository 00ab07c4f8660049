"""Salted (two-phase) aggregation — the skew pattern for power-law
group keys.

A single ``groupBy(keys)`` sends every row of a hot key to one
reducer task; at 100 TB one key holding 1% of the corpus serializes
1 TB through one core. Salting splits each key into ``salt_buckets``
sub-groups for the heavy first phase (partial states distribute
across the cluster), then merges the tiny per-(key, salt) states in a
second, cheap shuffle.

Only decomposable aggregates can ride this (sum/count/min/max, and
avg via sum+count decomposition) — which is also exactly what AQE's
skew handling can't fix for aggregations (AQE splits skewed JOIN
partitions, not skewed aggregation keys).

The salt is ``hash(all columns) % buckets`` — deterministic (no RNG,
stable re-execution under task retry) and uniform enough because row
contents differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure -> (phase-1 partial agg, phase-2 merge agg)
_DECOMPOSED = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """``measures``: (fn, col, alias) with fn in sum/count/min/max/avg.

    Result is identical to ``df.groupBy(keys).agg(...)`` — verified by
    tests/test_salt.py and the events_salted_rollup oracle entry.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))

    partials, finals = [], []
    for i, (fn, col, alias) in enumerate(measures):
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s{i}"),
                F.count(col).alias(f"__c{i}"),
            ]
            finals.append(
                (F.sum(f"__s{i}") / F.sum(f"__c{i}")).alias(alias)
            )
        elif fn in _DECOMPOSED:
            part, merge = _DECOMPOSED[fn]
            partials.append(part(col).alias(f"__p{i}"))
            finals.append(merge(f"__p{i}").alias(alias))
        else:
            raise ValueError(
                f"{fn!r} is not decomposable; salted_agg supports "
                "sum/count/min/max/avg"
            )

    phase1 = df.groupBy(*keys, salt.alias("__salt")).agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)

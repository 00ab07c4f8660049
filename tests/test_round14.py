"""Round-14 pins.

* `_apply_probe_filter` NULL best-cosine rule (r13 advice, low): a
  zero-norm query has NULL cosine to every centroid, so the window
  max ``__bm`` is NULL; the adaptive CASE must treat that like
  ``__bm <= 0`` (zero routing confidence → probe ALL lists) instead
  of letting a NULL comparison silently drop the query — fixed
  probing kept n_probe rows for such queries, adaptive must keep
  MORE, never fewer.
"""

from pyspark.sql import functions as F

from analyst_spark.functions.similarity import _apply_probe_filter


def test_probe_filter_null_best_cosine_probes_all(spark):
    # query 1: healthy routing (bm = 0.9) — clamped to n_probe
    # query 2: NULL cosine to every centroid (zero-norm vector)
    rows = [(1, 0.9, 1), (1, 0.5, 2), (1, 0.1, 3), (1, 0.05, 4)] + [
        (2, None, rn) for rn in range(1, 5)
    ]
    ranked = spark.createDataFrame(
        rows, "__id int, __csim double, __crn int"
    )
    out = _apply_probe_filter(ranked, n_probe=2, probe_scale=3.0, n_cap=4)
    got = {
        r["__id"]: r["n"]
        for r in out.groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # q1: ceil(3.0/0.9) = 4 -> capped at n_cap=4... scale 3.0 with
    # bm=900000 micro: (3e6 + 9e5 - 1) DIV 9e5 = 4 -> keeps 4 rows
    assert got[1] == 4
    # q2 (NULL bm): must probe ALL n_cap lists, not vanish
    assert got[2] == 4


def test_probe_filter_null_query_never_below_fixed_rule(spark):
    ranked = spark.createDataFrame(
        [(7, None, rn) for rn in range(1, 9)],
        "__id int, __csim double, __crn int",
    )
    fixed = _apply_probe_filter(ranked, n_probe=3, probe_scale=None, n_cap=8)
    adaptive = _apply_probe_filter(ranked, n_probe=3, probe_scale=3.0, n_cap=8)
    assert adaptive.count() >= fixed.count() == 3

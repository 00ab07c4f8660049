"""Window/cohort/split analytics — bounds for the entries without a
cross-engine oracle, and a regression for the ns→µs timestamp
conversion."""

import pyspark.sql.functions as F
import pytest

from analyst_spark.plans.catalog import QUERIES
from analyst_spark.tables import load_tables

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["events_approx_distinct"](spark, SF).collect()
    }
    ev = load_tables(spark, SF)["events"]
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(3, 0.05 * n), (et, approx[et], n)


def test_stratified_sample_rates(spark):
    sampled = {
        r.lang: r.n_sampled
        for r in QUERIES["docs_stratified_sample"](spark, SF).collect()
    }
    docs = load_tables(spark, SF)["documents"]
    totals = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        rate = sampled.get(lang, 0) / total
        assert 0.3 < rate < 0.7, (lang, rate)


def test_split_is_deterministic_and_complete(spark):
    df = QUERIES["docs_train_test_split"](spark, SF)
    rows = df.collect()
    total = sum(r.n_docs for r in rows)
    assert total == load_tables(spark, SF)["documents"].count()
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    # 80/10/10 within loose tolerance (hash buckets, not exact deciles)
    assert 0.7 < by_split["train"] / total < 0.9
    # re-run hashes identically
    assert sorted(map(tuple, rows)) == sorted(map(tuple, df.collect()))


def test_ts_microseconds_survive_roundtrip(spark):
    # ns→µs must use integer division: float division drifts 1µs on
    # epochs beyond 2^53 ns
    ev = load_tables(spark, SF)["events"]
    import duckdb

    duck = duckdb.sql(
        f"SELECT CAST(min(epoch_us(ts)) AS BIGINT) lo, CAST(max(epoch_us(ts)) AS BIGINT) hi "
        f"FROM '{SF}/events.parquet'"
    ).fetchone()
    got = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    assert (got.lo, got.hi) == duck


def test_moving_avg_frame_bounds(spark):
    df = QUERIES["events_moving_avg"](spark, SF)
    assert df.filter(F.col("mov_avg7").isNull()).count() == 0
    assert df.count() == load_tables(spark, SF)["events"].count()

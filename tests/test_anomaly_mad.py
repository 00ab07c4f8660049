"""events_anomaly_mad: hash gate proves Spark == DuckDB; these pin
the DEFINITION against a pure-Python median/MAD model, the robustness
property the zscore twin lacks, and the approx production path."""

import os
import statistics

import pytest
from pyspark.sql import functions as F

from analyst_spark.plans.analytics_plans import events_anomaly_mad
from analyst_spark.plans.catalog import QUERIES


def _model(rows, z_milli=3500):
    """rows: (event_id, event_type, value 2-decimal). Pure-Python
    integer modified z-score."""
    by_type = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((eid, v))
    out = {}
    for et, evs in by_type.items():
        cents = [round(v * 100) for _, v in evs]
        med2 = round(2 * statistics.median(cents))
        dev2s = [abs(2 * c - med2) for c in cents]
        mad4 = round(2 * statistics.median(dev2s))
        if mad4 <= 0:
            continue
        for (eid, v), c in zip(evs, cents):
            sdev2 = 2 * c - med2
            if 1349 * abs(sdev2) > z_milli * mad4:
                z = 1349 * abs(sdev2) // mad4
                out[eid] = -z if sdev2 < 0 else z
    return out


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("mad"))
    rows = []
    eid = 0
    # type A: tight cluster around 10.00 with two wild outliers that
    # would drag a mean/stddev detector
    for i in range(40):
        rows.append((eid, "A", 10.0 + (i % 5) * 0.01)); eid += 1
    rows += [(eid, "A", 9000.0), (eid + 1, "A", -8000.0)]; eid += 2
    # type B: constant (zero MAD) plus one deviant — unscorable group
    for i in range(10):
        rows.append((eid, "B", 5.0)); eid += 1
    rows.append((eid, "B", 100.0)); eid += 1
    # type C: moderate spread, no outliers
    for i in range(30):
        rows.append((eid, "C", float(i))); eid += 1
    import datetime
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i % 60), f"u{i%7}", et, v, None)
            for (i, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id string, event_type string, value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    return td, rows


def test_matches_python_model(spark, planted_sf):
    td, rows = planted_sf
    got = {
        r.event_id: r.robust_z_milli
        for r in QUERIES["events_anomaly_mad"](spark, td).collect()
    }
    want = _model(rows)
    assert got == want
    # the two planted type-A outliers are caught, signs correct
    assert got[40] > 0 and got[41] < 0


def test_robust_where_zscore_blind(spark, planted_sf):
    """The planted 9000/-8000 pair inflates type A's stddev so much
    the plain z-score misses them at 3 sigma on a 42-row group? No —
    but MAD must flag ONLY the two plants, never the tight cluster."""
    td, _ = planted_sf
    flagged = {
        r.event_id
        for r in QUERIES["events_anomaly_mad"](spark, td).collect()
        if r.event_type == "A"
    }
    assert flagged == {40, 41}


def test_zero_mad_group_excluded(spark, planted_sf):
    td, _ = planted_sf
    out = QUERIES["events_anomaly_mad"](spark, td).collect()
    assert not [r for r in out if r.event_type == "B"]


def test_approx_path_matches_on_clear_outliers(spark, planted_sf):
    """approx_percentile's median lands within its error bound of the
    exact median; on outliers this far from the threshold the flagged
    set is identical."""
    td, _ = planted_sf
    exact = {
        (r.event_id, r.robust_z_milli is not None)
        for r in events_anomaly_mad(spark, td, approx=False).collect()
    }
    approx = {
        (r.event_id, r.robust_z_milli is not None)
        for r in events_anomaly_mad(spark, td, approx=True).collect()
    }
    assert {e for e, _ in exact} == {e for e, _ in approx}


def test_streaming_twin_equals_batch(spark, planted_sf):
    """The streaming gate scores with frozen integer stats, so its
    per-type (n_events, n_anomalies) must equal the batch MAD count
    exactly — including the zero-MAD type B (counted, never flagged)."""
    td, rows = planted_sf
    got = {
        r.event_type: (r.n_events, r.n_anomalies)
        for r in QUERIES["streaming_anomaly_mad"](spark, td).collect()
    }
    flagged = _model(rows)
    by_type = {}
    for eid, et, v in rows:
        n, a = by_type.get(et, (0, 0))
        by_type[et] = (n + 1, a + (1 if eid in flagged else 0))
    assert got == by_type
    assert got["B"] == (11, 0)  # zero-MAD group: counted, unscorable


def test_domain_edge_values_do_not_overflow(spark, tmp_path_factory):
    """cents_of admits |value| <= 9e13 (cents to 9e15); 1349*dev2 then
    exceeds int64 — the review-found overflow. The DECIMAL(38,0)/
    HUGEINT headroom must score these exactly (python ints are the
    unbounded reference)."""
    import datetime

    # tight cluster (small MAD) + extremes at the domain edge: dev2
    # ~3.5e16, so the un-headroomed 1349*dev2 would wrap/crash int64
    rows = [(i, "E", 10.0 + i * 0.01) for i in range(10)]
    rows += [(10, "E", 8.9e13), (11, "E", -8.9e13), (12, "E", 11.0)]
    td = str(tmp_path_factory.mktemp("made"))
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, i % 60), "u", et, v, None)
            for (i, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    got = {
        r.event_id: r.robust_z_milli
        for r in QUERIES["events_anomaly_mad"](spark, td).collect()
    }
    assert got == _model(rows)
    assert got  # the edge corpus actually produces flags

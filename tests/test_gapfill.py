"""events_gapfill_interpolate: Timescale gapfill/locf/interpolate
semantics pinned on a hand-built series where every expected value is
computable by eye — the cross-engine hash gate proves Spark==DuckDB,
this proves both equal the DEFINITION."""

import datetime
import os

import pytest

from analyst_spark.plans.catalog import QUERIES


H = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _h(i):
    return H + datetime.timedelta(hours=i)


@pytest.fixture(scope="module")
def series_sf(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("gapfill_sf"))
    rows = [
        # type "a": values 10.00 at h0, gap h1-h3, 50.00 at h4 —
        # interp at h1/h2/h3 = 20/30/40; two events at h4 avg 50.
        (0, _h(0), 1, "a", 10.0, None),
        (1, _h(4), 1, "a", 40.0, None),
        (2, _h(4), 1, "a", 60.0, None),
        # type "b": NULL-value bucket in the middle: h0=2.00,
        # h1 has an event with NULL value (bucket present, avg NULL
        # -> treated as a gap for the value series), h2=4.00.
        (3, _h(0), 2, "b", 2.0, None),
        (4, _h(1), 2, "b", None, None),
        (5, _h(2), 2, "b", 4.0, None),
        # type "c": single bucket — no gaps, no interp edges.
        (6, _h(7), 3, "c", 7.5, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    return td


def test_interpolation_and_locf_semantics(spark, series_sf):
    out = {
        (r.event_type, r.bucket.hour): r
        for r in QUERIES["events_gapfill_interpolate"](
            spark, series_sf
        ).collect()
    }
    # type a: dense 5-bucket spine
    assert {h for (t, h) in out if t == "a"} == {0, 1, 2, 3, 4}
    a0, a1, a2, a3, a4 = (out[("a", i)] for i in range(5))
    assert (a0.n_events, a0.avg4, a0.locf4, a0.interp4) == (1, 100000, 100000, 100000)
    for r, want in ((a1, 200000), (a2, 300000), (a3, 400000)):
        assert r.n_events == 0 and r.avg4 is None
        assert r.locf4 == 100000  # carry-forward of h0
        assert r.interp4 == want
        assert r.interp_value == want / 10000.0
    assert (a4.n_events, a4.avg4) == (2, 500000)  # mean of 40 and 60

    # type b: the NULL-value bucket interpolates between neighbors
    b1 = out[("b", 1)]
    assert b1.n_events == 1 and b1.avg4 is None
    assert b1.locf4 == 20000 and b1.interp4 == 30000  # midpoint of 2.00/4.00

    # type c: single bucket, trivially known
    c = out[("c", 7)]
    assert (c.n_events, c.avg4, c.locf4, c.interp4) == (1, 75000, 75000, 75000)


def test_edges_are_null(spark, tmp_path_factory):
    # Leading gap: no prev -> locf/interp NULL; known row unaffected.
    td = str(tmp_path_factory.mktemp("gapfill_edge"))
    rows = [
        (0, _h(0), 1, "x", None, None),  # h0 known-bucket, NULL value
        (1, _h(2), 1, "x", 5.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    out = {
        r.bucket.hour: r
        for r in QUERIES["events_gapfill_interpolate"](spark, td).collect()
    }
    assert out[0].locf4 is None and out[0].interp4 is None
    assert out[1].locf4 is None and out[1].interp4 is None  # gap, no prev
    assert out[2].interp4 == 50000


def test_empty_events(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("gapfill_empty"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    assert QUERIES["events_gapfill_interpolate"](spark, td).collect() == []


def test_value_histogram_semantics(spark, tmp_path_factory):
    """events_value_histogram: exact bin assignment + member-exact
    bounds on a hand-built value set."""
    td = str(tmp_path_factory.mktemp("hist_sf"))
    rows = [
        # values 0.00 .. 10.00 -> cents 0..1000, 20 bins over range
        # 1001 wide -> bin = (c*20)//1001
        (i, _h(0), 1, "t", i / 10.0, None) for i in range(0, 101)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    out = {
        r.bin: r
        for r in QUERIES["events_value_histogram"](spark, td).collect()
    }
    import math

    model = {}
    for i in range(0, 101):
        c = i * 10  # exact cents
        b = (c * 20) // 1001
        model.setdefault(b, []).append(c)
    assert set(out) == set(model)
    for b, cs in model.items():
        assert out[b].n == len(cs)
        assert out[b].bin_min == min(cs) / 100.0
        assert out[b].bin_max == max(cs) / 100.0


def test_streaming_histogram_equals_batch(spark):
    """Order-free integer aggregates => the stream-built histogram is
    ROW-IDENTICAL to the batch entry across real micro-batch
    boundaries (8 staged files at maxFilesPerTrigger=2)."""
    sf = "/root/testdata/sf0.001"
    batch = {
        (r.event_type, r.bin): (r.n, r.bin_min, r.bin_max)
        for r in QUERIES["events_value_histogram"](spark, sf).collect()
    }
    stream = {
        (r.event_type, r.bin): (r.n, r.bin_min, r.bin_max)
        for r in QUERIES["streaming_value_histogram"](spark, sf).collect()
    }
    assert batch == stream and batch


def test_gapfill_matches_python_model_randomized(spark, tmp_path_factory):
    """Seeded randomized series vs a pure-Python gapfill model: the
    hand-built cases pin the easy shapes; this sweeps irregular
    gap/value patterns (including NULL-value buckets) the way the
    differential AQL suite sweeps the engine."""
    import random

    rng = random.Random(20260815)
    rows = []
    series = {}
    eid = 0
    for t_i, typ in enumerate(["p", "q", "r"]):
        hours = sorted(rng.sample(range(0, 48), rng.randint(3, 14)))
        vals = {}
        for h in hours:
            n = rng.randint(1, 3)
            cents_list = []
            for _ in range(n):
                if rng.random() < 0.15:
                    v, c = None, None
                else:
                    c = rng.randint(0, 100000)
                    v = c / 100.0
                rows.append((eid, _h(h), t_i, typ, v, None))
                eid += 1
                if c is not None:
                    cents_list.append(c)
            vals[h] = cents_list
        series[typ] = vals

    td = str(tmp_path_factory.mktemp("gapfill_rand"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))

    def avg4(cs):
        if not cs:
            return None
        s, n = sum(cs), len(cs)
        return (200 * s + n) // (2 * n) if s >= 0 else -((-200 * s + n) // (2 * n))

    expect = {}
    for typ, vals in series.items():
        hs = sorted(vals)
        lo, hi = hs[0], hs[-1]
        known = {h: avg4(vals[h]) for h in hs}
        for h in range(lo, hi + 1):
            a4 = known.get(h)
            prevs = [(x, known[x]) for x in range(lo, h + 1)
                     if known.get(x) is not None]
            nexts = [(x, known[x]) for x in range(h, hi + 1)
                     if known.get(x) is not None]
            locf = prevs[-1][1] if prevs else None
            if a4 is not None:
                interp = a4
            elif not prevs or not nexts:
                interp = None
            else:
                (hp, pv), (hn, nv) = prevs[-1], nexts[0]
                num, den = (nv - pv) * (h - hp), hn - hp
                q = (2 * abs(num) + den) // (2 * den)
                interp = pv + q if num >= 0 else pv - q
            n_events = len(vals.get(h, []))  # valid-measurement count only
            expect[(typ, h)] = (a4, locf, interp)

    out = QUERIES["events_gapfill_interpolate"](spark, td).collect()
    got = {
        (r.event_type, r.bucket.day * 24 + r.bucket.hour - 24): (
            r.avg4, r.locf4, r.interp4,
        )
        for r in out
    }
    assert got == expect


# ------------------------------------------- chunked windows (r10)


def _rows(df):
    return sorted(
        (r.event_type, r.bucket, r.n_events, r.avg4, r.locf4, r.interp4)
        for r in df.collect()
    )


def test_chunked_equals_global_on_catalog_data(spark):
    sf = "/root/testdata/sf0.001"
    a = _rows(QUERIES["events_gapfill_interpolate"](spark, sf))
    b = _rows(QUERIES["events_gapfill_chunked"](spark, sf))
    assert a == b


@pytest.mark.parametrize("chunk_hours", [1, 2, 3, 5, 1000])
def test_chunked_equals_global_across_chunk_sizes(
    spark, series_sf, chunk_hours
):
    """Tiny chunks force gaps to SPAN chunks and produce all-gap
    chunks (type 'a' has a 3-hour gap; chunk_hours=1 makes each hour
    its own window partition), so carry-in/carry-out stitching is
    exercised on every boundary shape; 1000 degrades to one chunk
    (must equal the global plan trivially)."""
    from analyst_spark.plans.events_plans import _gapfill_chunked

    a = _rows(QUERIES["events_gapfill_interpolate"](spark, series_sf))
    b = _rows(_gapfill_chunked(spark, series_sf, chunk_hours))
    assert a == b


def test_chunked_multi_chunk_gap_carry(spark, tmp_path_factory):
    """A gap spanning SEVERAL all-gap chunks: known at h0 and h10
    with chunk_hours=3 leaves chunks {1,2} fully unknown — LOCF must
    carry h0's value through both, interpolation must bracket h0/h10
    across them."""
    import os

    from analyst_spark.plans.events_plans import _gapfill_chunked

    td = str(tmp_path_factory.mktemp("gapfill_carry"))
    rows = [
        (0, _h(0), 1, "x", 10.0, None),
        (1, _h(10), 1, "x", 20.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    a = _rows(QUERIES["events_gapfill_interpolate"](spark, td))
    b = _rows(_gapfill_chunked(spark, td, 3))
    assert a == b
    # and the values are the linear ramp 10.00 -> 20.00 in 1e-4 units
    interp = {r[1].hour: r[5] for r in b}
    assert interp[0] == 100000 and interp[10] == 200000
    assert interp[5] == 150000


# ------------------------------- span router (VERDICT r10 #3)


def test_router_picks_global_on_short_span(spark):
    """The catalog corpora span ~30 days (720h) — under the 4-month
    threshold the router must take the global form and report it."""
    sf = "/root/testdata/sf0.001"
    out = QUERIES["events_gapfill_routed"](spark, sf)
    assert out._asp_routing["form"] == "global"
    assert 0 < out._asp_routing["span_hours"] <= 24 * 31
    # same oracle semantics: routed == global rows
    assert _rows(out) == _rows(
        QUERIES["events_gapfill_interpolate"](spark, sf)
    )


def test_router_picks_chunked_on_long_span(spark, tmp_path_factory):
    """A corpus spanning > threshold hours must route to the chunked
    form and still produce the bit-identical output."""
    import os

    from analyst_spark.plans.events_plans import (
        GAPFILL_ROUTE_SPAN_HOURS,
        _gapfill_routed,
    )

    td = str(tmp_path_factory.mktemp("gapfill_span"))
    far = GAPFILL_ROUTE_SPAN_HOURS + 24
    rows = [
        (0, _h(0), 1, "x", 10.0, None),
        (1, _h(far), 1, "x", 20.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    out = _gapfill_routed(spark, td, GAPFILL_ROUTE_SPAN_HOURS)
    assert out._asp_routing["form"] == "chunked"
    assert out._asp_routing["span_hours"] == far + 1
    assert _rows(out) == _rows(
        QUERIES["events_gapfill_interpolate"](spark, td)
    )


def test_router_low_threshold_routes_catalog_to_chunked(spark):
    """Forcing a tiny threshold routes the standard corpus to the
    chunked form — both corpus shapes exercised through the router
    itself, same rows either way."""
    from analyst_spark.plans.events_plans import _gapfill_routed

    sf = "/root/testdata/sf0.001"
    out = _gapfill_routed(spark, sf, 10)
    assert out._asp_routing["form"] == "chunked"
    assert _rows(out) == _rows(
        QUERIES["events_gapfill_interpolate"](spark, sf)
    )


def test_router_empty_events(spark, tmp_path_factory):
    import os

    td = str(tmp_path_factory.mktemp("gapfill_routed_empty"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    out = QUERIES["events_gapfill_routed"](spark, td)
    assert out._asp_routing["form"] == "global"
    assert out._asp_routing["span_hours"] == 0
    assert out.collect() == []

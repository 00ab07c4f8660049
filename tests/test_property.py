"""Property-based tests (hypothesis): Spark operators vs independent
reference models — pandas.merge_asof for the as-of join, a direct
python port of the reference's ZOH interval walk for zoh_mean.

Strategy sizes are small (Spark round-trip per example is the cost),
but shrinking still finds minimal counterexamples; deadline disabled
because JVM latency is not the property under test.
"""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from analyst_spark.operators.asof import asof_join
from analyst_spark.operators.zoh import zoh_mean

_BASE = datetime(2024, 1, 1)


def _ts(minutes):
    return _BASE + timedelta(minutes=int(minutes))


_PROP_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def asof_case(draw):
    keys = ["a", "b"]
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 120)),
            min_size=1, max_size=8,
        )
    )
    right = draw(
        st.lists(
            st.tuples(
                st.sampled_from(keys), st.integers(0, 120), st.integers(0, 50)
            ),
            min_size=0, max_size=8, unique_by=lambda r: (r[0], r[1]),
        )
    )
    return left, right


@given(asof_case())
@settings(**_PROP_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(left_rows)],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(m), v) for k, m, v in right_rows],
        "k string, ts timestamp, v long",
    ) if right_rows else spark.createDataFrame([], "k string, ts timestamp, v long")

    got = {
        r.lid: r.v_asof
        for r in asof_join(left, right, "ts", ["k"], ["v"]).collect()
    }

    if not right_rows:
        want = {i: None for i in range(len(left_rows))}
    else:
        lpdf = pd.DataFrame(
            [(i, k, _ts(m)) for i, (k, m) in enumerate(left_rows)],
            columns=["lid", "k", "ts"],
        ).sort_values("ts", kind="stable")
        rpdf = pd.DataFrame(right_rows, columns=["k", "m", "v"])
        rpdf["ts"] = rpdf["m"].map(_ts)
        rpdf = rpdf.sort_values("ts", kind="stable")[["k", "ts", "v"]]
        merged = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k", direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
    assert got == want


def _zoh_model(points, start_s, finish_s):
    """Direct port of the reference's interval walk
    (transforms/zoh.go:175-236): sort by time, clamp intervals to
    [start, finish], hold each value to the next point, NULL if the
    series starts after start or the interval is empty."""
    if finish_s <= start_s:
        return None
    pts = sorted(points)
    if not pts or pts[0][0] > start_s:
        return None
    total = 0.0
    for i, (t, v) in enumerate(pts):
        nxt = pts[i + 1][0] if i + 1 < len(pts) else finish_s
        w = max(0.0, min(nxt, finish_s) - max(t, start_s))
        total += v * w
    return total / (finish_s - start_s)


@st.composite
def zoh_case(draw):
    pts = draw(
        st.lists(
            st.tuples(st.integers(0, 100), st.integers(-10, 10)),
            min_size=1, max_size=8, unique_by=lambda p: p[0],
        )
    )
    start = draw(st.integers(0, 100))
    finish = draw(st.integers(0, 110))
    return pts, start, finish


@given(zoh_case())
@settings(**_PROP_SETTINGS)
def test_zoh_matches_reference_model(spark, case):
    pts, start_m, finish_m = case
    rows = [("g", _ts(m).isoformat(), float(v)) for m, v in pts]
    df = spark.createDataFrame(rows, "g string, t string, v double")
    out = zoh_mean(
        df, ["g"], "t", "v",
        _ts(start_m).isoformat(), _ts(finish_m).isoformat(), alias="m",
    ).collect()
    want = _zoh_model(
        [(m * 60.0, float(v)) for m, v in pts], start_m * 60.0, finish_m * 60.0
    )
    assert len(out) == 1
    got = out[0].m
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-9)


@st.composite
def upsert_case(draw):
    base = draw(
        st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 99)),
            min_size=0, max_size=10, unique_by=lambda r: r[0],
        )
    )
    updates = draw(
        st.lists(
            st.tuples(st.integers(0, 12), st.integers(100, 199)),
            min_size=0, max_size=10, unique_by=lambda r: r[0],
        )
    )
    return base, updates


@given(upsert_case())
@settings(**_PROP_SETTINGS)
def test_merge_upsert_matches_dict_model(spark, case):
    from analyst_spark.operators.upsert import merge_upsert

    base, updates = case
    expected = dict(base)
    expected.update(dict(updates))  # last-write-wins by key
    bdf = spark.createDataFrame(base or [(None, None)], "k int, v int")
    if not base:
        bdf = bdf.filter("k IS NOT NULL")
    udf_ = spark.createDataFrame(updates or [(None, None)], "k int, v int")
    if not updates:
        udf_ = udf_.filter("k IS NOT NULL")
    got = {r.k: r.v for r in merge_upsert(bdf, udf_, "k").collect()}
    assert got == expected


# ------------------------------------------------- exact dedup model


@st.composite
def dedup_case(draw):
    n = draw(st.integers(2, 30))
    # small text alphabet forces collisions; varied whitespace/case
    # exercises normalization
    texts = draw(st.lists(
        st.sampled_from(["a b", "A  b", "c", " c ", "d e f", "x"]),
        min_size=n, max_size=n))
    return list(enumerate(texts))


@given(dedup_case())
@settings(**_PROP_SETTINGS)
def test_exact_dedup_matches_model(spark, case):
    """Survivor set == lowest id per normalized content (model:
    plain dict over normalized text)."""
    import re as _re

    from analyst_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(case, ["doc_id", "text"])
    got = sorted(r.doc_id for r in exact_dedup(df).collect())
    model = {}
    for i, txt in case:
        key = _re.sub(r"\s+", " ", txt.lower()).strip()
        model.setdefault(key, i)
    assert got == sorted(model.values())


# ------------------------------------------------- cron next() model


@st.composite
def cron_case(draw):
    def field(lo, hi, k):
        vals = draw(st.lists(st.integers(lo, hi), min_size=1, max_size=k,
                             unique=True))
        return ",".join(str(v) for v in sorted(vals))

    sec = field(0, 59, 2)
    minute = field(0, 59, 3)
    hour = field(0, 23, 3)
    # keep day fields matchable within the scan horizon
    dom = draw(st.sampled_from(["*", field(1, 28, 3)]))
    dow = draw(st.sampled_from(["*", field(0, 6, 2)]))
    spec = f"{sec} {minute} {hour} {dom} * {dow}"
    t0 = datetime(2026, draw(st.integers(1, 12)), draw(st.integers(1, 28)),
                  draw(st.integers(0, 23)), draw(st.integers(0, 59)),
                  draw(st.integers(0, 59)))
    return spec, t0


@given(cron_case())
@settings(max_examples=25, deadline=None)
def test_cron_next_matches_bruteforce(case):
    """next(t) == the first second strictly after t whose fields all
    match, found by linear scan (bounded to 35 days — generated specs
    always fire within a month)."""
    from analyst_spark.scheduling.cron import parse_cron

    spec, t0 = case
    sched = parse_cron(spec)
    got = sched.next(t0)

    t = t0.replace(microsecond=0) + timedelta(seconds=1)
    end = t + timedelta(days=35)
    expected = None
    while t < end:
        if (t.second in sched.seconds and t.minute in sched.minutes
                and t.hour in sched.hours and t.month in sched.months
                and sched._day_matches(t)):
            expected = t
            break
        # skip in coarse steps where fields already rule the slot out
        if t.hour not in sched.hours:
            t = (t + timedelta(hours=1)).replace(minute=0, second=0)
        elif t.minute not in sched.minutes:
            t = (t + timedelta(minutes=1)).replace(second=0)
        else:
            t += timedelta(seconds=1)
    assert got == expected


# ------------------------------------------------- lookup last-wins


@st.composite
def lookup_case(draw):
    n_base = draw(st.integers(1, 15))
    n_lk = draw(st.integers(1, 20))
    base = [(i, draw(st.integers(0, 4))) for i in range(n_base)]
    # (key, value, order) — duplicate keys likely; order decides winner
    lk = [
        (draw(st.integers(0, 4)), draw(st.integers(0, 99)), i)
        for i in range(n_lk)
    ]
    how = draw(st.sampled_from(["inner", "outer"]))
    return base, lk, how


@given(lookup_case())
@settings(**_PROP_SETTINGS)
def test_lookup_join_matches_dict_model(spark, case):
    """lookup_join == probe of a dict built in order_col order with
    last-wins overwrite (transforms/lookup.go:50,:185-188), INNER
    dropping unmatched, OUTER keeping them with NULL."""
    from analyst_spark.operators.lookup import lookup_join

    base, lk, how = case
    bdf = spark.createDataFrame(base, ["bid", "k"])
    ldf = spark.createDataFrame(lk, ["lk", "v", "ord"])
    got = sorted(
        ((r.bid, r.v) for r in lookup_join(
            bdf, ldf, on=[("k", "lk")], select={"v": "v"},
            how=how, order_col="ord",
        ).collect()),
        key=lambda t: (t[0], t[1] is not None, t[1] or 0),
    )
    table = {}
    for key, v, _ in lk:  # list is already in ord order
        table[key] = v
    model = []
    for bid, k in base:
        if k in table:
            model.append((bid, table[k]))
        elif how == "outer":
            model.append((bid, None))
    model.sort(key=lambda t: (t[0], t[1] is not None, t[1] or 0))
    assert got == model


# ----------------------------------------------------------------- near-dup

import hashlib
import re
from collections import Counter, defaultdict

from analyst_spark.functions.dedup import minhash_pairs, minhash_signatures, simhash_signatures


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tokens_model(t: str) -> list[str]:
    # twin of functions/text.py tokens(): split(trim(c), r"\s+");
    # Spark's split on the empty string yields [""]
    t = t.strip()
    return re.split(r"\s+", t) if t else [""]


def _minhash_sigs_model(rows, n, k):
    from analyst_spark.functions.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    out = {}
    for doc_id, text in rows:
        toks = _tokens_model(text)
        if len(toks) >= n:
            shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        else:
            shingles = set()
        if not shingles:
            continue  # no exploded rows -> no signature row
        hvs = [int(_md5(s)[:8], 16) for s in shingles]
        out[doc_id] = [
            min((MINHASH_A[i] * hv + MINHASH_B[i]) % MINHASH_P for hv in hvs)
            for i in range(k)
        ]
    return out


def _minhash_pairs_model(rows, n, bands, rpb):
    sigs = _minhash_sigs_model(rows, n, bands * rpb)
    votes: Counter = Counter()
    for b in range(bands):
        buckets = defaultdict(list)
        for d, sig in sigs.items():
            buckets[_md5("|".join(str(x) for x in sig[b * rpb:(b + 1) * rpb]))].append(d)
        for ds in buckets.values():
            ds.sort()
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    votes[(ds[i], ds[j])] += 1
    return dict(votes)


def _simhash_model(rows, bits=32):
    nd = bits // 4
    out = {}
    for doc_id, text in rows:
        sums = [0] * bits
        for t in _tokens_model(text):
            hv = int(_md5(t)[:nd], 16)
            for j in range(bits):
                shift = (nd - 1 - j // 4) * 4 + j % 4
                sums[j] += 2 * ((hv >> shift) & 1) - 1
        out[doc_id] = sum(2 ** j for j in range(bits) if sums[j] > 0)
    return out


_WORDS = ["red", "fox", "ran", "far", "too", "now"]


@st.composite
def doc_corpus(draw):
    n_docs = draw(st.integers(2, 5))
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=7))
        docs.append((i, " ".join(words)))
    # bias toward near-dups: sometimes clone a doc with a small edit
    if draw(st.booleans()) and docs[0][1]:
        docs.append((n_docs, docs[0][1] + " " + draw(st.sampled_from(_WORDS))))
    return docs


@given(doc_corpus())
@settings(**_PROP_SETTINGS)
def test_minhash_band_collisions_match_python_lsh(spark, docs):
    """Distributed banded-LSH candidate pairs (and their band vote
    counts) equal a pure-Python LSH over the same seeded-md5 minhash —
    signature, banding, and bucket join all pinned at once."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got_sigs = {
        r.doc_id: [r[f"mh{i}"] for i in range(6)]
        for r in minhash_signatures(df, n=2, num_hashes=6).collect()
    }
    assert got_sigs == _minhash_sigs_model(docs, n=2, k=6)

    pairs_df = minhash_pairs(df, n=2, bands=3, rows_per_band=2)
    got = {(r.id_a, r.id_b): r.n_bands for r in pairs_df.collect()}
    from analyst_spark.functions.dedup import release_cached

    release_cached(pairs_df)
    assert got == _minhash_pairs_model(docs, n=2, bands=3, rpb=2)


@given(doc_corpus())
@settings(**_PROP_SETTINGS)
def test_simhash_signatures_match_python_twin(spark, docs):
    """The one-pass 32-bit-sum SimHash equals a per-token python walk
    over the same md5-derived bits."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    assert got == _simhash_model(docs)


def test_simhash_bit_flip_distance():
    """Sanity on the model itself: editing one token changes few bits
    (hamming locality), a disjoint doc changes many."""
    base = "red fox ran far too now red fox"
    rows = [(0, base), (1, base.replace("far", "too")),
            (2, "aaa bbb ccc ddd eee fff ggg hhh")]
    sigs = _simhash_model(rows)

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])


# ----------------------------------------------------------------- winnowing

from analyst_spark.plans.pipeline_plans import _WIN_K, _WIN_W, winnow_stats


def _winnow_model(rows, k=_WIN_K, w=_WIN_W):
    """Pure-Python winnowing twin: md5 per k-gram, per-window min,
    same short-document edges as the Spark/DuckDB forms."""
    out = {}
    for doc_id, text in rows:
        t = _tokens_model(text)
        gs = [_md5(" ".join(t[i:i + k])) for i in range(len(t) - k + 1)]
        if len(gs) >= w:
            fps = [min(gs[i:i + w]) for i in range(len(gs) - w + 1)]
        elif gs:
            fps = [min(gs)]
        else:
            fps = []
        out[doc_id] = (
            len(gs),
            len(fps),
            len(set(fps)),
            min(fps) if fps else None,
            max(fps) if fps else None,
        )
    return out


@st.composite
def winnow_corpus(draw):
    docs = []
    for i in range(draw(st.integers(1, 4))):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14))
        docs.append((i, " ".join(words)))
    return docs


@given(winnow_corpus())
@settings(**_PROP_SETTINGS)
def test_winnow_matches_python_twin(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_kgrams, r.n_selected, r.n_distinct, r.min_fp, r.max_fp)
        for r in winnow_stats(df).collect()
    }
    assert got == _winnow_model(docs)


def test_winnow_shared_run_guarantee():
    """The winnowing invariant on the model itself: two docs sharing a
    run of w+k-1 tokens share at least one selected fingerprint."""
    shared = "red fox ran far too now red fox".split()  # w+k-1 = 8 tokens
    a = " ".join(["too"] * 3 + shared + ["now"] * 2)
    b = " ".join(["far"] * 5 + shared)
    m = _winnow_model([(0, a), (1, b)])
    # recompute the fingerprint SETS to intersect
    def fps(text):
        t = _tokens_model(text)
        gs = [_md5(" ".join(t[i:i + _WIN_K])) for i in range(len(t) - _WIN_K + 1)]
        return {min(gs[i:i + _WIN_W]) for i in range(len(gs) - _WIN_W + 1)}
    assert fps(a) & fps(b)


# ---- ParameterTable vs case-insensitive dict model --------------------------

import hypothesis.strategies as _st
from hypothesis import given as _given, settings as _settings


@_given(
    ops=_st.lists(
        _st.tuples(
            _st.sampled_from(["set", "get", "update", "pop", "copy_set"]),
            _st.sampled_from(["Aa", "AA", "aa", "Bb", "b_B", "Cc"]),
            _st.integers(0, 9),
        ),
        max_size=30,
    )
)
@_settings(max_examples=60, deadline=None)
def test_parameter_table_matches_ci_dict_model(ops):
    """Every access path (including the C-level dict(pt) view) must
    agree with a plain model: canonical upper-case keyed values +
    first-seen display spelling."""
    from analyst_spark.sinks.parameter import ParameterTable

    pt = ParameterTable()
    model: dict[str, int] = {}     # canon -> value
    display: dict[str, str] = {}   # canon -> first-seen spelling
    for op, key, val in ops:
        c = key.upper()
        if op == "set":
            pt[key] = val
            model[c] = val
            display.setdefault(c, key)
        elif op == "get":
            assert pt.get(key) == model.get(c)
            assert (key in pt) == (c in model)
        elif op == "update":
            pt.update({key: val})
            model[c] = val
            display.setdefault(c, key)
        elif op == "pop":
            if c in model:
                assert pt.pop(key) == model.pop(c)
                display.pop(c)
            else:
                assert pt.pop(key, "d") == "d"
        elif op == "copy_set":
            cp = pt.copy()
            cp[key] = val + 100  # must not leak into the original
            assert pt.get(key) == model.get(c)
    # the C-level view: display spellings, correct values
    assert dict(pt) == {display[c]: v for c, v in model.items()}


# ---- pgwire quote_literal: SQL round trip via DuckDB ------------------------

@_given(
    _st.one_of(
        _st.text(max_size=40),
        _st.integers(-10**12, 10**12),
        _st.floats(allow_nan=False, allow_infinity=False, width=64),
        _st.booleans(),
        _st.none(),
    )
)
@_settings(max_examples=120, deadline=None)
def test_pgwire_quote_literal_roundtrips_through_sql(v):
    """quote_literal must produce a literal any engine parses back to
    the same value (DuckDB stands in as the SQL oracle; the same
    quoting rules hold on postgres — injection-safe '' escaping)."""
    import duckdb

    from analyst_spark.sources.pgwire import quote_literal

    if isinstance(v, str) and "\x00" in v:
        v = v.replace("\x00", "")  # NUL can't live in a SQL literal
    got = duckdb.sql(f"SELECT {quote_literal(v)} AS v").fetchone()[0]
    if v is None:
        assert got is None
    elif isinstance(v, bool):
        assert got is v
    elif isinstance(v, float):
        assert float(got) == v
    elif isinstance(v, int):
        assert int(got) == v
    else:
        assert got == v


# ---- DEDUP transform vs python model ----------------------------------------

@_given(
    rows=_st.lists(
        _st.tuples(
            _st.integers(0, 5),      # key
            _st.integers(0, 100),    # payload
        ),
        min_size=1,
        max_size=30,
    ),
    keep=_st.sampled_from(["FIRST", "LAST"]),
)
@_settings(max_examples=20, deadline=None)
def test_dedup_transform_matches_model(spark, rows, keep):
    from analyst_spark.aql.transforms_parser import build_dedup, parse_dedup

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]  # unique ord col
    df = spark.createDataFrame(data, ["ord", "k", "v"])
    out = build_dedup(df, parse_dedup(f"DEDUP ON k KEEP {keep} BY ord"))
    got = {r.k: (r.ord, r.v) for r in out.collect()}
    model: dict[int, tuple[int, int]] = {}
    for ordv, k, v in data:
        if k not in model:
            model[k] = (ordv, v)
        elif keep == "FIRST" and ordv < model[k][0]:
            model[k] = (ordv, v)
        elif keep == "LAST" and ordv > model[k][0]:
            model[k] = (ordv, v)
    assert got == model

"""Seeded randomized differential sweep for the round-9-late
operators: random corpora/event sets cross-checked against the
pure-Python models their dedicated tests pin on fixed plants. Catches
the edge classes a hand-built plant misses (ties at thresholds,
single-token docs, all-identical groups, unicode tokens)."""

import hashlib
import os
import random
import statistics

import pytest

from analyst_spark.functions.classifier_frozen import (
    BIAS_NANO,
    N_BUCKETS,
    WEIGHTS_NANO,
)
from analyst_spark.plans.catalog import QUERIES
from analyst_spark.plans.pipeline_plans import (
    _PMI_MIN_COUNT,
    _PMI_TOP_K,
    _PRUNE_GRID,
)

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "héllo", "wörld", "数据", "x1", "y2",
]


def _rand_texts(rng, n_docs):
    texts = []
    for _ in range(n_docs):
        kind = rng.random()
        if kind < 0.05:
            texts.append(None)
        elif kind < 0.10:
            texts.append("")
        elif kind < 0.15:
            texts.append(rng.choice(VOCAB))  # single token
        else:
            n = rng.randint(2, 30)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n)))
    return texts


def _write_docs(spark, td, texts):
    spark.createDataFrame(
        [
            (i, t, rng_lang(i), "web", len(t) if t else 0)
            for i, t in enumerate(texts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))


def rng_lang(i):
    return ("en", "fr", "de")[i % 3]


# ------------------------------------------------------------- PMI

def _pmi_model(texts):
    c1, c2 = {}, {}
    for t in texts:
        if t is None:
            continue
        toks = [w for w in t.strip().lower().split() if w]
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    rows = [
        (a, b, c, (c * n1 * n1 * 1_000_000) // (n2 * c1[a] * c1[b]))
        for (a, b), c in c2.items()
        if c >= _PMI_MIN_COUNT
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:_PMI_TOP_K]


@pytest.mark.parametrize("seed", range(6))
def test_pmi_random_corpora(spark, tmp_path_factory, seed):
    rng = random.Random(1000 + seed)
    texts = _rand_texts(rng, rng.randint(20, 120))
    td = str(tmp_path_factory.mktemp(f"pmi{seed}"))
    _write_docs(spark, td, texts)
    got = [
        (r.w1, r.w2, r.pair_count, r.lift_micro)
        for r in QUERIES["docs_collocations_pmi"](spark, td).collect()
    ]
    assert got == _pmi_model(texts)


# ----------------------------------------------------- prune curve

def _prune_model(texts):
    scored = []
    for t in texts:
        if t is None:
            scored.append(None)
            continue
        toks = [w for w in t.strip().lower().split()] or [""]
        numer = sum(
            WEIGHTS_NANO[
                int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % N_BUCKETS
            ]
            for w in toks
        )
        n_toks = len(t.strip().split()) or 1
        scored.append((numer, len(toks), n_toks))
    all_docs = len(scored)
    all_tokens = sum(s[2] for s in scored if s)
    out = []
    for thr in _PRUNE_GRID:
        nd = nt = 0
        for s in scored:
            if s and s[0] + BIAS_NANO * s[1] >= thr * s[1] * 1_000_000:
                nd += 1
                nt += s[2]
        out.append(
            (
                thr,
                nd,
                nt,
                nd * 1_000_000 // all_docs if all_docs else None,
                nt * 1_000_000 // all_tokens if all_tokens else None,
            )
        )
    return out


@pytest.mark.parametrize("seed", range(6))
def test_prune_curve_random_corpora(spark, tmp_path_factory, seed):
    rng = random.Random(2000 + seed)
    texts = _rand_texts(rng, rng.randint(10, 80))
    td = str(tmp_path_factory.mktemp(f"prune{seed}"))
    _write_docs(spark, td, texts)
    got = [
        (r.thr_milli, r.n_docs_kept, r.n_tokens_kept, r.docs_ppm, r.tokens_ppm)
        for r in QUERIES["docs_quality_prune_curve"](spark, td)
        .orderBy("thr_milli")
        .collect()
    ]
    assert got == _prune_model(texts)


# ------------------------------------------------------------- MAD

def _mad_model(rows, z_milli=3500):
    by_type = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((eid, v))
    out = {}
    for _, evs in by_type.items():
        cents = [round(v * 100) for _, v in evs]
        med2 = round(2 * statistics.median(cents))
        mad4 = round(2 * statistics.median([abs(2 * c - med2) for c in cents]))
        if mad4 <= 0:
            continue
        for (eid, _), c in zip(evs, cents):
            sdev2 = 2 * c - med2
            if 1349 * abs(sdev2) > z_milli * mad4:
                z = 1349 * abs(sdev2) // mad4
                out[eid] = -z if sdev2 < 0 else z
    return out


@pytest.mark.parametrize("seed", range(6))
def test_mad_random_events(spark, tmp_path_factory, seed):
    import datetime

    rng = random.Random(3000 + seed)
    rows = []
    eid = 0
    for et in ("A", "B", "C"):
        n = rng.randint(3, 60)
        scale = rng.choice([0.01, 1.0, 250.0])
        for _ in range(n):
            if rng.random() < 0.2:
                v = round(rng.choice([-1, 1]) * rng.uniform(50, 500) * scale, 2)
            else:
                v = round(rng.gauss(10 * scale, scale), 2)
            rows.append((eid, et, v))
            eid += 1
    # an all-identical group (zero MAD) every other seed
    if seed % 2:
        for _ in range(7):
            rows.append((eid, "D", 42.0))
            eid += 1
    td = str(tmp_path_factory.mktemp(f"mad{seed}"))
    spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, i % 60), f"u{i%5}", et, v, None)
            for (i, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id string, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
    got = {
        r.event_id: r.robust_z_milli
        for r in QUERIES["events_anomaly_mad"](spark, td).collect()
    }
    assert got == _mad_model(rows)


# ------------------------------------------- consistent bottom-k

def _bottomk_model(ids, k=20):
    by_lang = {}
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_lang.setdefault(rng_lang(i), []).append((h, i))
    out = set()
    for lang, rows in by_lang.items():
        for rnk, (_, i) in enumerate(sorted(rows)[:k], 1):
            out.add((lang, rnk, i))
    return out


@pytest.mark.parametrize("seed", range(3))
def test_bottomk_random_id_sets(spark, tmp_path_factory, seed):
    rng = random.Random(4000 + seed)
    ids = rng.sample(range(10_000_000), rng.randint(5, 300))
    td = str(tmp_path_factory.mktemp(f"bk{seed}"))
    spark.createDataFrame(
        [(i, f"t {i}", rng_lang(i), "web", 5) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
    got = {
        (r.lang, r.rnk, r.doc_id)
        for r in QUERIES["docs_consistent_sample"](spark, td).collect()
    }
    assert got == _bottomk_model(ids)


# ---------------------------------------------------- containment

def _containment_model(texts, n=3, num=4, den=5):
    import itertools

    def sh(t):
        toks = [w for w in t.split() if w]
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    sets = {i: sh(t) for i, t in enumerate(texts) if t is not None}
    want = {}
    for a, b in itertools.permutations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa:
            continue
        i = len(sa & sb)
        if den * i >= num * len(sa):
            want[(a, b)] = round(i / len(sa), 6)
    return want


@pytest.mark.parametrize("seed", range(4))
def test_containment_random_corpora(spark, tmp_path_factory, seed):
    rng = random.Random(5000 + seed)
    texts = []
    for _ in range(rng.randint(10, 50)):
        base = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 15)))
        texts.append(base)
        if rng.random() < 0.4:  # plant containers: base wrapped in filler
            wrap = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(4, 10)))
            texts.append(f"{wrap} {base} {wrap}")
        if rng.random() < 0.1:
            texts.append(None)
    td = str(tmp_path_factory.mktemp(f"cont{seed}"))
    _write_docs(spark, td, texts)
    got = {
        (r.id_contained, r.id_container): r.containment
        for r in QUERIES["dedup_containment"](spark, td).collect()
    }
    assert got == _containment_model(texts)

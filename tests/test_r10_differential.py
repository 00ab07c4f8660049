"""Seeded randomized differential sweep for the round-10 operators:
random corpora cross-checked against pure-Python models (the
test_r9_differential pattern). Catches edge classes the fixed plants
miss — threshold ties, shingle-less docs, unicode tokens, non-8x8
images, gaps spanning random chunk boundaries.
"""

import hashlib
import os
import random

import pytest

from analyst_spark.functions.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    incremental_neardup_pairs,
    neardup_signature_index,
    release_cached,
)

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
    "theta", "iota", "kappa", "héllo", "wörld", "数据", "x1", "y2",
]


def _rand_text(rng):
    k = rng.random()
    if k < 0.06:
        return None
    if k < 0.12:
        return ""
    if k < 0.18:
        return rng.choice(VOCAB)
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 25)))


# ------------------------------------------------ incremental neardup


def _sig_model(text, k=8, n=3):
    if text is None:
        return None
    toks = [w for w in text.strip().split() if w]
    if len(toks) < n:
        return None
    shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    hvs = [
        int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles
    ]
    return tuple(
        min((hv * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P for hv in hvs)
        for i in range(k)
    )


def _bucket_model(sig, bands=4, rows=2):
    out = []
    for b in range(bands):
        key = "|".join(str(sig[b * rows + r]) for r in range(rows))
        out.append((b, hashlib.md5(key.encode()).hexdigest()))
    return out


def _incr_model(hist, batch, min_match=6):
    hsig = {i: _sig_model(t) for i, t in hist}
    bsig = {i: _sig_model(t) for i, t in batch}
    hbuck = {}
    for i, s in hsig.items():
        if s is None:
            continue
        for bb in _bucket_model(s):
            hbuck.setdefault(bb, []).append(i)
    pairs = {}
    for i, s in bsig.items():
        if s is None:
            continue
        cands = set()
        for bb in _bucket_model(s):
            cands.update(hbuck.get(bb, ()))
        for h in cands:
            nm = sum(a == b for a, b in zip(s, hsig[h]))
            if nm >= min_match:
                pairs[(i, h)] = nm
    return pairs


@pytest.mark.parametrize("seed", range(6))
def test_incremental_neardup_random_vs_model(spark, seed):
    rng = random.Random(4200 + seed)
    hist = [(i, _rand_text(rng)) for i in range(40)]
    # batch: fresh texts + copies/near-copies of history
    batch = []
    for j in range(25):
        i = 1000 + j
        r = rng.random()
        if r < 0.3 and hist:
            batch.append((i, rng.choice(hist)[1]))  # exact copy
        elif r < 0.5 and hist:
            src = rng.choice(hist)[1]
            if src:
                toks = src.split()
                if len(toks) > 4:
                    del toks[rng.randrange(len(toks))]
                batch.append((i, " ".join(toks)))  # near copy
            else:
                batch.append((i, src))
        else:
            batch.append((i, _rand_text(rng)))
    hdf = spark.createDataFrame(hist, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    idx = neardup_signature_index(hdf)
    out = incremental_neardup_pairs(idx, bdf)
    got = {(r.id_batch, r.id_hist): r.n_match for r in out.collect()}
    release_cached(out)
    assert got == _incr_model(hist, batch), f"seed {seed}"


# ------------------------------------------------ perceptual dedup


def _dhash_model(buf):
    import struct

    w, h, _c = struct.unpack("<iii", buf[8:20])
    px = buf[20 : 20 + w * h]
    grid = [
        px[((y * h) // 8) * w + ((x * w) // 8)]
        for y in range(8)
        for x in range(8)
    ]
    bits = [
        1 if grid[b] > grid[(b // 8) * 8 + ((b % 8) + 1) % 8] else 0
        for b in range(64)
    ]
    return tuple(
        sum(bits[k * 16 + p] << p for p in range(16)) for k in range(4)
    )


@pytest.mark.parametrize("seed", range(4))
def test_perceptual_dedup_random_vs_bruteforce(spark, seed):
    from analyst_spark.functions.multimodal import (
        encode_fake_image,
        perceptual_dedup_pairs,
    )

    rng = random.Random(7700 + seed)
    imgs = {}
    for i in range(30):
        w, h = rng.choice([(8, 8), (8, 8), (16, 16), (4, 4), (16, 8)])
        buf = bytearray(encode_fake_image(rng.randrange(300), w, h))
        if rng.random() < 0.4:  # random single-pixel perturbation
            buf[20 + rng.randrange(w * h)] = rng.randrange(256)
        imgs[i] = bytes(buf)
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in imgs.items()],
        "doc_id long, image binary",
    )
    out = perceptual_dedup_pairs(df, max_distance=3)
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    release_cached(out)
    sigs = {i: _dhash_model(b) for i, b in imgs.items()}
    want = {}
    ids = sorted(sigs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            d = sum(
                bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b])
            )
            if d <= 3:
                want[(a, b)] = d
    # the banded join is recall-1 at d<=3 (pigeonhole): EXACT equality
    assert got == want, f"seed {seed}"


# ------------------------------------------------ multi-query BM25


def _bm25_model(texts, queries, k):
    import math

    toks = {
        i: [w for w in t.split(" ") if w]
        for i, t in texts
        if t is not None
    }
    toks = {i: ws for i, ws in toks.items() if ws}
    n_docs = len(toks)
    t_tokens = sum(len(ws) for ws in toks.values())
    terms = {t for _q, t in queries}
    tf = {}
    for i, ws in toks.items():
        for w in ws:
            if w in terms:
                tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_i, w) in tf:
        df[w] = df.get(w, 0) + 1

    def half_up(x):
        import math as m

        return m.floor(x + 0.5) if x >= 0 else m.ceil(x - 0.5)

    c = {}
    for (i, w), f in tf.items():
        idf = half_up(
            math.log((2 * n_docs + 2) / (2.0 * df[w] + 1)) * 1e6
        )
        d = 10 * t_tokens * f + 3 * t_tokens + 9 * len(toks[i]) * n_docs
        c[(i, w)] = (2 * (idf * f * 22 * t_tokens) + d) // (2 * d)
    per_q = {}
    for q, t in set(queries):
        for i in toks:
            if (i, t) in c:
                per_q[(q, i)] = per_q.get((q, i), 0) + c[(i, t)]
    out = {}
    byq = {}
    for (q, i), s in per_q.items():
        byq.setdefault(q, []).append((i, s))
    for q, lst in byq.items():
        lst.sort(key=lambda r: (-r[1], r[0]))
        for rank, (i, s) in enumerate(lst[:k], 1):
            out[(q, i)] = (s, rank)
    return out


@pytest.mark.parametrize("seed", range(5))
def test_bm25_multi_random_vs_model(spark, seed):
    from analyst_spark.functions.retrieval import bm25_topk_multi

    rng = random.Random(9900 + seed)
    texts = [(i, _rand_text(rng)) for i in range(35)]
    queries = [
        (q, rng.choice(VOCAB))
        for q in range(1, rng.randint(2, 5))
        for _ in range(rng.randint(1, 3))
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id int, term string")
    out = bm25_topk_multi(docs, qdf, k=5)
    got = {
        (r.query_id, r.doc_id): (r.score_micro, r.rank)
        for r in out.collect()
    }
    release_cached(out)
    assert got == _bm25_model(texts, queries, k=5), f"seed {seed}"


# ------------------------------------------------ chunked gapfill


@pytest.mark.parametrize("seed", range(4))
def test_chunked_gapfill_random_equals_global(spark, tmp_path, seed):
    import datetime

    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.events_plans import _gapfill_chunked

    rng = random.Random(1300 + seed)
    h0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for ty in ("a", "b", "c")[: rng.randint(1, 3)]:
        for _ in range(rng.randint(1, 25)):
            ts = h0 + datetime.timedelta(
                hours=rng.randrange(200), minutes=rng.randrange(60)
            )
            val = (
                None
                if rng.random() < 0.15
                else round(rng.uniform(-50, 50), 2)
            )
            rows.append((eid, ts, rng.randrange(5), ty, val, None))
            eid += 1
    td = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
    chunk = rng.choice([1, 3, 7, 24, 100])
    a = sorted(
        map(tuple, QUERIES["events_gapfill_interpolate"](spark, td).collect())
    )
    b = sorted(map(tuple, _gapfill_chunked(spark, td, chunk).collect()))
    assert a == b, f"seed {seed} chunk {chunk}"

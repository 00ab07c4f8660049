"""Incremental NEAR-dup (VERDICT r9 #1): batch-vs-history probe
against a maintained minhash signature index.

Contract under test:
* an exact copy in the batch ALWAYS pairs with its history source
  (identical shingle sets → identical signatures → every band
  collides, n_match = k);
* unrelated batch docs (disjoint vocabulary) never pair;
* the planted perturbed twins of the catalog entry are recovered
  across the batch/history boundary (plant-and-recover);
* history participates only via the index — the probe runs with NO
  access to history text.
"""

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.dedup import (
    band_buckets,
    incremental_neardup_pairs,
    minhash_signatures,
    neardup_signature_index,
    release_cached,
)

LONG_A = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
LONG_B = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(12))
UNRELATED = " ".join(f"omega{i} psi{i} chi{i}" for i in range(12))


@pytest.fixture(scope="module")
def hist_index(spark):
    hist = spark.createDataFrame(
        [(1, LONG_A), (2, LONG_B)], ["doc_id", "text"]
    )
    idx = neardup_signature_index(hist).persist()
    idx.count()
    yield idx
    idx.unpersist()


def test_exact_copy_always_recovered(spark, hist_index):
    batch = spark.createDataFrame(
        [(100, LONG_A), (101, UNRELATED)], ["doc_id", "text"]
    )
    out = incremental_neardup_pairs(hist_index, batch)
    rows = {(r.id_batch, r.id_hist): r.n_match for r in out.collect()}
    assert rows.get((100, 1)) == 8, "exact copy must match on ALL k"
    assert all(b != 101 for (b, _h) in rows), "unrelated doc paired"
    release_cached(out)


def test_near_copy_scores_below_exact(spark, hist_index):
    # drop one interior token: J = 33/37 ≈ 0.9 — must still be found
    # by SOME band for this fixed corpus (deterministic arithmetic),
    # with n_match <= 8
    near = LONG_A.replace(" beta5 ", " ")
    batch = spark.createDataFrame([(200, near)], ["doc_id", "text"])
    out = incremental_neardup_pairs(hist_index, batch, min_match=5)
    rows = {(r.id_batch, r.id_hist): r.n_match for r in out.collect()}
    assert (200, 1) in rows
    assert 5 <= rows[(200, 1)] <= 8
    release_cached(out)


def test_probe_never_touches_history_text(spark):
    # the index alone drives the probe: history text column is gone
    hist = spark.createDataFrame([(1, LONG_A)], ["doc_id", "text"])
    idx = neardup_signature_index(hist)
    assert "text" not in idx.columns
    assert set(idx.columns) == {"doc_id"} | {f"mh{i}" for i in range(8)}
    batch = spark.createDataFrame([(300, LONG_A)], ["doc_id", "text"])
    out = incremental_neardup_pairs(idx, batch)
    assert [(r.id_batch, r.id_hist) for r in out.collect()] == [(300, 1)]
    release_cached(out)


def test_band_buckets_matches_pairs_banding(spark):
    # an index built here must be probe-compatible with minhash_pairs'
    # banding: same doc → same (band, bucket) rows from either path
    df = spark.createDataFrame([(1, LONG_A), (2, LONG_B)], ["doc_id", "text"])
    sigs = minhash_signatures(df, num_hashes=8)
    direct = {tuple(r) for r in band_buckets(sigs).collect()}
    again = {tuple(r) for r in band_buckets(
        neardup_signature_index(df)).collect()}
    assert direct == again and len(direct) == 8  # 2 docs × 4 bands


def test_catalog_plant_and_recover(spark):
    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.text_plans import (
        _INCR_MOD,
        _INEAR_OFFSET,
        _INEAR_STEP,
    )
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = QUERIES["dedup_incremental_neardup"](spark, sf)
    got = {(r.id_batch, r.id_hist) for r in out.collect()}
    release_cached(out)
    docs = load_tables(spark, sf)["documents"]
    planted = [
        r.doc_id
        for r in docs.filter(
            (F.col("doc_id") % _INCR_MOD != 0)
            & (F.col("doc_id") % _INEAR_STEP == 0)
            & (F.size(F.split(F.trim("text"), r"\s+")) >= 20)
        ).select("doc_id").collect()
    ]
    assert planted, "fixture must plant twins"
    recovered = sum(
        1 for h in planted if (4 * (h + _INEAR_OFFSET), h) in got
    )
    # dropping one token of a >=20-token doc keeps J >= 0.9; the
    # 4x2 banding finds the overwhelming majority deterministically
    assert recovered >= 0.8 * len(planted), (recovered, len(planted))


def test_stateless_signatures_equal_batch_form(spark):
    """The per-row (stream-safe) signature form must produce values
    IDENTICAL to the groupBy form — the property that makes the
    streaming twin row-identical to the batch entry."""
    from analyst_spark.functions.dedup import neardup_signatures_stateless

    from analyst_spark.tables import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].select(
        "doc_id", "text"
    )
    batch = {
        tuple(r) for r in minhash_signatures(docs, num_hashes=8).collect()
    }
    stateless = {
        tuple(r)
        for r in neardup_signatures_stateless(docs, num_hashes=8).collect()
    }
    assert batch == stateless and batch


def test_stateless_drops_shingleless_docs(spark):
    from analyst_spark.functions.dedup import neardup_signatures_stateless

    df = spark.createDataFrame(
        [(1, "only two"), (2, LONG_A)], ["doc_id", "text"]
    )
    out = neardup_signatures_stateless(df)
    assert [r.doc_id for r in out.collect()] == [2]


# ------------------------- multi-day lifecycle (VERDICT r10 #2)


LONG_C = " ".join(f"eta{i} theta{i} iota{i}" for i in range(12))


def _drop_first(text):
    return text.split(" ", 1)[1]


class TestIncrementalLifecycle:
    def test_day_boundary_plants_and_index_append(self, spark):
        """A day-2 twin of a day-1 document can only pair if day 1's
        signatures were appended to the index — the maintenance step
        itself, observed through plants."""
        from analyst_spark.functions.dedup import (
            incremental_neardup_ingest,
        )

        hist = spark.createDataFrame([(1, LONG_A)], ["doc_id", "text"])
        index = neardup_signature_index(hist)
        b1 = spark.createDataFrame(
            [(100, LONG_B), (101, _drop_first(LONG_A))],
            ["doc_id", "text"],
        )
        b2 = spark.createDataFrame(
            [(200, _drop_first(LONG_B)), (201, UNRELATED)],
            ["doc_id", "text"],
        )
        p1, index, rep = incremental_neardup_ingest(
            index, b1, None, min_match=5
        )
        d1 = {(r.id_batch, r.id_hist) for r in p1.collect()}
        assert (101, 1) in d1  # batch-vs-initial-history
        assert not any(b == 100 for b, _ in d1)
        p2, index, rep = incremental_neardup_ingest(
            index, b2, rep, min_match=5
        )
        d2 = {(r.id_batch, r.id_hist) for r in p2.collect()}
        # 200 pairs with 100 ONLY via the appended day-1 signatures
        assert (200, 100) in d2
        assert not any(b == 201 for b, _ in d2)
        release_cached(p1)
        release_cached(p2)

    def test_same_day_intra_batch_pairs(self, spark):
        from analyst_spark.functions.dedup import (
            incremental_neardup_ingest,
        )

        hist = spark.createDataFrame([(1, LONG_C)], ["doc_id", "text"])
        batch = spark.createDataFrame(
            [(100, LONG_A), (105, _drop_first(LONG_A))],
            ["doc_id", "text"],
        )
        pairs, _idx, _rep = incremental_neardup_ingest(
            neardup_signature_index(hist), batch, None, min_match=5
        )
        got = {(r.id_batch, r.id_hist) for r in pairs.collect()}
        assert (105, 100) in got  # later id is the duplicate
        release_cached(pairs)
        pairs2, _i, _r = incremental_neardup_ingest(
            neardup_signature_index(hist),
            batch,
            None,
            min_match=5,
            include_intra_batch=False,
        )
        assert not pairs2.collect()
        release_cached(pairs2)

    def test_replay_is_idempotent_via_ledger(self, spark):
        """Reprocessing a day's file must not re-emit the pairs the
        first run reported — in EITHER crash window: replay against
        the pre-append index (state write failed) and against the
        POST-append index (state written, ack lost — the batch then
        meets its own appended signatures: self-pairs and the
        reversed orientation of ledgered intra pairs must also be
        suppressed; r11 review finding)."""
        from analyst_spark.functions.dedup import (
            incremental_neardup_ingest,
        )

        hist = spark.createDataFrame([(1, LONG_A)], ["doc_id", "text"])
        index0 = neardup_signature_index(hist)
        batch = spark.createDataFrame(
            [(100, _drop_first(LONG_A)), (105, _drop_first(LONG_A))],
            ["doc_id", "text"],
        )
        p1, index1, rep1 = incremental_neardup_ingest(
            index0, batch, None, min_match=5
        )
        got1 = {(r.id_batch, r.id_hist) for r in p1.collect()}
        assert got1 == {(100, 1), (105, 1), (105, 100)}
        # crash window A: replay against the PRE-append index
        p_replay_a, _i, _r = incremental_neardup_ingest(
            index0, batch, rep1, min_match=5
        )
        assert p_replay_a.collect() == []
        # crash window B: replay against the POST-append index — the
        # batch's own signatures are in index1 now; no self-pairs, no
        # reversed (100, 105), nothing already ledgered
        p_replay_b, _i2, _r2 = incremental_neardup_ingest(
            index1, batch, rep1, min_match=5
        )
        assert p_replay_b.collect() == []
        release_cached(p1)
        release_cached(p_replay_a)
        release_cached(p_replay_b)

    def test_catalog_multiday_plants(self, spark):
        """The factor-2 (day-2 twin of day-1 doc) and factor-4
        (same-day twin) plants of the gated entry are recovered with
        the right day tags."""
        from analyst_spark.plans.catalog import QUERIES
        from analyst_spark.plans.text_plans import _INEAR_OFFSET
        from analyst_spark.tables import load_tables

        sf = "/root/testdata/sf0.001"
        out = QUERIES["dedup_incremental_multiday"](spark, sf)
        got = {(r.day, r.id_batch, r.id_hist) for r in out.collect()}
        release_cached(out)
        docs = load_tables(spark, sf)["documents"]
        long_enough = F.size(F.split(F.trim("text"), r"\s+")) >= 20
        day2_src = [
            r.doc_id
            for r in docs.filter(
                (F.col("doc_id") % 60 == 0) & long_enough
            ).collect()
        ]
        day3_same = [
            r.doc_id
            for r in docs.filter(
                (F.col("doc_id") % 60 == 20) & long_enough
            ).collect()
        ]
        assert day2_src and day3_same, "fixture must plant twins"
        rec2 = sum(
            1
            for h in day2_src
            if (2, 4 * (h + 2 * _INEAR_OFFSET), h) in got
        )
        rec3 = sum(
            1
            for h in day3_same
            if (3, 4 * (h + 4 * _INEAR_OFFSET), h) in got
        )
        assert rec2 >= 0.8 * len(day2_src), (rec2, len(day2_src))
        assert rec3 >= 0.8 * len(day3_same), (rec3, len(day3_same))
        # no pair may point forward in time: day tag is the batch
        # doc's day, its partner entered on a strictly earlier day or
        # the same day with a smaller id
        assert all(day in (1, 2, 3) for day, _b, _h in got)

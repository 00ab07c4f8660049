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

"""Prefix-vs-LSH router (VERDICT r9 #2): the sampled df-skew probe
routes jaccard_prefix_pairs on healthy corpora and lsh_verified_pairs
on the corpus-scale-vocabulary shape SCALE.md documents as the exact
prefix join's inherent boundary.
"""

import itertools

import pytest

from analyst_spark.functions.dedup import (
    jaccard_prefix_pairs,
    neardup_pairs_auto,
    neardup_route_probe,
    release_cached,
)


@pytest.fixture(scope="module")
def healthy(spark):
    from analyst_spark.tables import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")["documents"]


@pytest.fixture(scope="module")
def degenerate(spark):
    # SCALE.md's boundary shape: a per-doc token interleaved between
    # every original token — nearly every shingle distinct
    base = [(i, " ".join(f"w{j % 37}" for j in range(60))) for i in range(400)]
    rows = [
        (
            i,
            " ".join(
                itertools.chain.from_iterable(
                    (f"u{i}_{j}", t) for j, t in enumerate(txt.split())
                )
            ),
        )
        for i, txt in base
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_probe_separates_corpus_shapes(spark, healthy, degenerate):
    ph = neardup_route_probe(healthy)
    pd = neardup_route_probe(degenerate)
    assert ph["compression"] > 1.4, ph
    assert pd["compression"] == pytest.approx(1.0, abs=0.01), pd
    assert pd["hapax_fraction"] > 0.99
    assert ph["hapax_fraction"] < 0.9


def test_healthy_routes_to_prefix_and_matches_direct(spark, healthy):
    out = neardup_pairs_auto(healthy)
    assert out._asp_routing["strategy"] == "prefix"
    assert out._asp_routing["compression"] >= out._asp_routing[
        "compression_cutoff"
    ]
    direct = jaccard_prefix_pairs(healthy)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, direct.collect()))
    assert got == want, "router must not change the prefix result"
    release_cached(out)
    release_cached(direct)


def test_degenerate_routes_to_lsh(spark, degenerate):
    out = neardup_pairs_auto(degenerate)
    r = out._asp_routing
    assert r["strategy"] == "lsh"
    assert r["compression"] < r["compression_cutoff"]
    # schema is the shared pair contract either way
    assert out.columns == ["id_a", "id_b", "jaccard"]
    # interleaved tokens kill cross-doc similarity: no pairs
    assert out.count() == 0
    release_cached(out)


def test_empty_corpus_routes_safely(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    probe = neardup_route_probe(empty)
    assert probe["compression"] == 1.0 and probe["postings"] == 0
    out = neardup_pairs_auto(empty)
    assert out._asp_routing["strategy"] == "lsh"
    assert out.count() == 0
    release_cached(out)

"""Bloom-pruned semi-join (functions/bloom.py): exactness (candidates
are a superset of true matches, final result equals the plain
semi-join), pruning actually bites, probe joins broadcast, and the
word table stays within its declared bound."""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

from analyst_spark.functions.bloom import bloom_build, bloom_prune, bloom_semi_join
from analyst_spark.tables import load_tables

SF = "/root/testdata/sf0.001"
N_BITS = 1 << 16


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def tables(spark):
    t = load_tables(spark, SF)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["lineitem"], urgent


def test_no_false_negatives_and_pruning_bites(spark, tables):
    li, urgent = tables
    fact = li.select("l_orderkey")
    words = bloom_build(urgent.select("o_orderkey"), "o_orderkey", N_BITS)
    cand = {
        r.l_orderkey for r in bloom_prune(fact, "l_orderkey", words, N_BITS).collect()
    }
    true_keys = {r.o_orderkey for r in urgent.select("o_orderkey").collect()}
    fact_keys = {r.l_orderkey for r in fact.collect()}
    matches = fact_keys & true_keys
    assert matches <= cand, "bloom probe dropped a true match"
    # sf0.001: 1500 orders, ~300 urgent -> ~80% of fact keys should go
    assert len(cand) < 0.5 * len(fact_keys), (
        f"pruning did not bite: {len(cand)}/{len(fact_keys)} candidates"
    )
    # false-positive sliver small at ~200 bits/key
    assert len(cand - matches) <= max(5, 0.05 * len(matches))


def test_semi_join_equals_plain(spark, tables):
    li, urgent = tables
    got = bloom_semi_join(
        li.select("l_orderkey", "l_linenumber"),
        "l_orderkey",
        urgent.select("o_orderkey"),
        "o_orderkey",
        n_bits=N_BITS,
    )
    want = li.select("l_orderkey", "l_linenumber").join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_probe_joins_broadcast(spark, tables):
    li, urgent = tables
    df = bloom_semi_join(
        li.select("l_orderkey"), "l_orderkey",
        urgent.select("o_orderkey"), "o_orderkey", n_bits=N_BITS,
    )
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_word_table_bounded_and_merge_is_bitor(spark, tables):
    _, urgent = tables
    words = bloom_build(urgent.select("o_orderkey"), "o_orderkey", N_BITS).collect()
    assert len(words) <= N_BITS // 64
    assert all(0 <= r.word_idx < N_BITS // 64 for r in words)
    # partition-order freedom: same bits from a repartitioned build
    re = bloom_build(
        urgent.select("o_orderkey").repartition(7), "o_orderkey", N_BITS
    ).collect()
    assert sorted((r.word_idx, r.bits) for r in words) == sorted(
        (r.word_idx, r.bits) for r in re
    )


def test_null_keys_match_nothing(spark):
    dim = spark.createDataFrame([(1,), (None,)], "k long")
    fact = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    got = bloom_semi_join(fact, "k", dim, "k", n_bits=64 * 4)
    assert [r.k for r in got.collect()] == [1]


def test_empty_dim_yields_empty(spark):
    dim = spark.createDataFrame([], "k long")
    fact = spark.createDataFrame([(1,), (2,)], "k long")
    assert bloom_semi_join(fact, "k", dim, "k", n_bits=64 * 4).count() == 0


def test_parameter_validation(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_build(dim, "k", 63)
    with pytest.raises(ValueError):
        bloom_build(dim, "k", 0)
    with pytest.raises(ValueError):
        bloom_build(dim, "k", 64, n_hashes=0)


def test_high_bit_position_round_trip(spark):
    """A key whose position lands on bit 63 of a word must survive the
    sign-bit mask (1<<63 is the most negative long)."""
    # brute-force a key hitting pos % 64 == 63 under seed 0
    keys = spark.range(0, 3000).select(F.col("id").alias("k"))
    hit = keys.filter(
        F.pmod(F.xxhash64("k", F.lit(0)), F.lit(256)) % 64 == 63
    ).limit(1)
    vals = hit.collect()
    assert vals, "no key hit bit 63 in the search range"
    dim = spark.createDataFrame([(vals[0].k,)], "k long")
    got = bloom_semi_join(keys, "k", dim, "k", n_bits=256)
    assert [r.k for r in got.collect()] == [vals[0].k]


def test_auto_sizing(spark, tables):
    from analyst_spark.functions.bloom import sized_bits

    assert sized_bits(0) == 1 << 16
    assert sized_bits(30_000) == 1 << 19  # 480k -> next pow2
    assert sized_bits(300_000) == 1 << 23
    # cap: billions of keys must not size an uncollectable table
    from analyst_spark.functions.bloom import MAX_AUTO_BITS
    assert sized_bits(10_000_000_000) == MAX_AUTO_BITS
    li, urgent = tables
    got = bloom_semi_join(
        li.select("l_orderkey"), "l_orderkey",
        urgent.select("o_orderkey"), "o_orderkey",  # n_bits=None
    )
    want = li.select("l_orderkey").join(
        urgent.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey", "left_semi",
    )
    assert got.count() == want.count()


def test_string_keys_round_trip(spark):
    """xxhash64 hashes any type: the filter must work on string keys
    (the doc-fingerprint / URL shape) end to end."""
    dim = spark.createDataFrame(
        [("alpha",), ("beta",), (None,)], "k string"
    )
    fact = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), (None,), ("delta",)], "k string"
    )
    got = bloom_semi_join(fact, "k", dim, "k", n_bits=64 * 8)
    assert sorted(r.k for r in got.collect()) == ["alpha", "beta"]

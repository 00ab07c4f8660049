"""Distributed BPE trainer vs the pure-Python reference model —
identical merge sequences (integer counts + lexicographic tie-break
make them a pure function of the corpus)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from analyst_spark.functions.bpe import bpe_train, bpe_train_model


def test_bpe_known_corpus(spark):
    texts = ["low low low low low", "lower lower", "newest newest newest",
             "widest widest"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe_train(df, num_merges=6)
    want = bpe_train_model(texts, num_merges=6)
    assert got == want
    # classic result: 'lo' or a tie-ranked pair first, counts monotone
    assert all(n >= 2 for _, _, n in got)


def test_bpe_early_stop_no_repeats(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    # all words single-char: no pairs at all -> zero merges
    assert bpe_train(df, num_merges=4) == []


@given(st.lists(
    st.sampled_from(["aa ab", "abab cc", "aabb aabb", "cab cab cab", "b a"]),
    min_size=1, max_size=4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bpe_matches_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    assert bpe_train(df, num_merges=5) == bpe_train_model(texts, num_merges=5)


def test_bpe_encode_roundtrip(spark):
    """Encoding with trained merges matches the python twin, and
    token concatenation reconstructs the input words."""
    from pyspark.sql import functions as F

    from analyst_spark.functions.bpe import bpe_encode, bpe_encode_model

    texts = ["low lower lowest", "new newest", "wide widest low"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges = bpe_train(df, num_merges=5)
    got = [r.toks for r in df.select(bpe_encode("text", merges).alias("toks")).collect()]
    want = [bpe_encode_model(t, merges) for t in texts]
    assert got == want
    for t, toks in zip(texts, got):
        assert "".join(toks) == t.replace(" ", "")

"""Text analysis: token counting, language-ID, quality, fingerprint."""

from pyspark.sql import functions as F

from analyst_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    normalize_text,
    quality_features,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame([("  a b   c  ",), ("one",)], ["text"])
    out = df.select(token_count("text").alias("n")).collect()
    assert [r.n for r in out] == [3, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world 42!",)], ["text"])
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0].n
    # hello | , | world | 4 | 2 | !
    assert n == 6


def test_language_id_markers(spark):
    rows = [
        ("the cat and the dog is here",),     # en
        ("le chat et la maison est ici",),    # fr
        ("der hund und die katze ist da",),   # de
        ("el gato y los perros es aqui",),    # es
        ("xyzzy qwerty plugh",),              # und
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = [r.l for r in df.select(language_id("text").alias("l")).collect()]
    assert out == ["en", "fr", "de", "es", "und"]


def test_quality_features_crafted(spark):
    df = spark.createDataFrame([(1, "the cat is on the mat")], ["doc_id", "text"])
    r = quality_features(df).collect()[0]
    assert r.n_tokens == 6
    assert r.n_chars == 21
    assert r.punct_ratio == 0.0
    # markers: the, is, the -> 3/6
    assert abs(r.stopword_ratio - 0.5) < 1e-6
    assert 0.0 <= r.quality_score <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["text"]
    )
    out = [r.f for r in df.select(doc_fingerprint("text").alias("f")).collect()]
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert len(out[0]) == 32  # md5 hex

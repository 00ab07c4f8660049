"""dedup_jaccard_prefix (AllPairs/PPJoin prefix filtering): the hash
gate proves equality with the brute-force oracle (= completeness on
the real corpus); these pin the DEFINITION on planted overlaps and
prove the pruning actually bites."""

import itertools
import os

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.dedup import (
    jaccard_prefix_pairs,
    release_cached,
    shingles_exploded,
)
from analyst_spark.plans.catalog import QUERIES


def _shingles_py(text, n=3):
    toks = [w for w in text.split(" ") if w]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),
    (1, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 0
    (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 0
    (3, "one two three four five six seven eight nine"),
    (4, "totally different words appear in this document here"),
    (5, "one two three four five six seven eight ten"),    # near-dup of 3
    (6, "short doc"),                                      # < n tokens: no shingles
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in CORPUS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_matches_python_model(spark, planted):
    out = jaccard_prefix_pairs(planted, threshold_num=3, threshold_den=5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    release_cached(out)

    sets = {i: _shingles_py(t) for i, t in CORPUS}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        i = len(sa & sb)
        # exact rational test: J >= 3/5  <=>  8i >= 3(|A|+|B|)
        if 8 * i >= 3 * (len(sa) + len(sb)):
            want[(a, b)] = round(i / (len(sa) + len(sb) - i), 6)
    assert rows == want and want  # the plant produces qualifying pairs
    assert (0, 2) in want  # exact dup found (jaccard 1.0)


def test_prefix_pruning_bites(spark):
    """The prefix join must examine strictly fewer candidate pairs
    than the all-shared-shingle join on the real corpus."""
    docs = QUERIES  # noqa: F841 — keep import shape obvious
    from analyst_spark.tables import load_tables

    d = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    sh = shingles_exploded(d).persist()
    full_cands = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    prefix = (
        sh.join(dfreq, "shingle")
        .join(sizes, "doc_id")
        .withColumn("__pos", F.row_number().over(wdoc))
        .filter(
            F.col("__pos")
            <= F.col("n_sh") - F.expr("(3*n_sh + 4) DIV 5") + F.lit(1)
        )
        .select("doc_id", "shingle")
    )
    prefix_cands = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    sh.unpersist()
    assert 0 < prefix_cands < full_cands


def test_empty_and_shingleless(spark, tmp_path_factory):
    td = str(tmp_path_factory.mktemp("ppjoin_empty"))
    spark.createDataFrame(
        [(0, "a b", "en", "web", 3)],  # < 3 tokens: zero shingles
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(td, "documents.parquet"))
    df = QUERIES["dedup_jaccard_prefix"](spark, td)
    assert df.collect() == []
    release_cached(df)

# ---------------------------------------------------------------- leakage

def test_split_leakage_planted(spark, tmp_path_factory):
    """docs_split_leakage = near-dup pairs crossing the deterministic
    80/10/10 split. Ids chosen by computing the md5 bucket in pure
    Python: 1,2,3 -> train; 5 -> valid; 8 -> test."""
    import hashlib

    def py_split(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    assert [py_split(i) for i in (1, 2, 3, 5, 8)] == [
        "train", "train", "train", "valid", "test",
    ]
    base = "alpha beta gamma delta epsilon zeta eta"
    corpus = [
        (1, base + " theta"),   # train — near-dup of 5 and 8 (leaks)
        (2, base + " theta"),   # train — exact dup of 1 (same split: NOT a leak)
        (3, "one two three four five six seven eight nine"),  # train, unique
        (5, base + " iota"),    # valid — near-dup of 1/2 (leaks)
        (8, base + " theta"),   # test — exact dup of 1/2 (leaks)
    ]
    td = str(tmp_path_factory.mktemp("leakage"))
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in corpus],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(os.path.join(td, "documents.parquet"))

    df = QUERIES["docs_split_leakage"](spark, td)
    got = {(r.id_a, r.id_b): (r.split_a, r.split_b) for r in df.collect()}
    release_cached(df)
    assert got == {
        (1, 5): ("train", "valid"),
        (2, 5): ("train", "valid"),
        (1, 8): ("train", "test"),
        (2, 8): ("train", "test"),
        (5, 8): ("valid", "test"),
    }
    # the within-split exact dup (1,2) is near-dup but NOT leakage
    assert (1, 2) not in got

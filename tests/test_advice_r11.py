"""Pins for the round-10 ADVICE items (all four fixed in r11) plus
VERDICT r10 #1 (hot-bucket cap in banded_hamming_pairs).

Each test constructs exactly the failure scenario the advisor
described and asserts the fixed behavior.
"""

import pytest
from pyspark.sql import functions as F


class TestRrfMultiStringQueryIds:
    """ADVICE r10 #1: rrf_fuse_multi silently cast query_col to int —
    string topic ids became NULL and every query collapsed into one
    fused window. Fixed: join on the column as-is, like rrf_fuse."""

    def test_string_query_ids_stay_separate(self, spark):
        from analyst_spark.functions.retrieval import rrf_fuse_multi

        lex = spark.createDataFrame(
            [
                ("topic-a", 10, 1),
                ("topic-a", 11, 2),
                ("topic-b", 20, 1),
                ("topic-b", 21, 2),
            ],
            "query_id string, doc_id long, rank int",
        )
        sem = spark.createDataFrame(
            [
                ("topic-a", 11, 1),
                ("topic-a", 10, 2),
                ("topic-b", 21, 1),
                ("topic-b", 20, 2),
            ],
            "query_id string, doc_id long, rank int",
        )
        out = rrf_fuse_multi([("lex", lex), ("sem", sem)], k=2).collect()
        by_q = {}
        for r in out:
            assert r.query_id is not None, "query id must never be NULLed"
            by_q.setdefault(r.query_id, set()).add(r.doc_id)
        assert by_q == {"topic-a": {10, 11}, "topic-b": {20, 21}}
        # symmetric ranks (1+2 both sides) -> equal rrf_nano, doc order
        # by id asc within each query
        for r in out:
            assert r.rrf_nano == 2 * (
                1000000000 // 61 if r.lex_rank == 1 else 0
            ) or r.rrf_nano > 0

    def test_int_query_ids_unchanged(self, spark):
        from analyst_spark.functions.retrieval import rrf_fuse_multi

        lex = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], "query_id int, doc_id long, rank int"
        )
        sem = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], "query_id int, doc_id long, rank int"
        )
        out = rrf_fuse_multi([("lex", lex), ("sem", sem)], k=5).collect()
        assert {(r.query_id, r.doc_id) for r in out} == {(1, 10), (2, 20)}


class TestBandedHammingDistanceContract:
    """ADVICE r10 #2: max_distance >= 4 breaks the 4-band pigeonhole
    recall-1 guarantee silently. Fixed: explicit ValueError."""

    def _sigs(self, spark):
        return spark.createDataFrame(
            [(1, 1, 2, 3, 4), (2, 1, 2, 3, 5)],
            "doc_id long, b0 int, b1 int, b2 int, b3 int",
        )

    def test_distance_4_rejected(self, spark):
        from analyst_spark.functions.multimodal import banded_hamming_pairs

        with pytest.raises(ValueError, match="pigeonhole"):
            banded_hamming_pairs(self._sigs(spark), max_distance=4)
        with pytest.raises(ValueError):
            banded_hamming_pairs(self._sigs(spark), max_distance=-1)

    def test_distance_3_still_works(self, spark):
        from analyst_spark.functions.dedup import release_cached
        from analyst_spark.functions.multimodal import banded_hamming_pairs

        out = banded_hamming_pairs(self._sigs(spark), max_distance=3)
        assert [
            (r.id_a, r.id_b, r.hamming) for r in out.collect()
        ] == [(1, 2, 1)]
        release_cached(out)


class TestContainmentDroppedAccounting:
    """ADVICE r10 #3: _asp_dropped_postings reported df·(df−1) —
    postings², overstating the removed work and counting self-pairs.
    Fixed: dropped_rows = prefix_occurrences(shingle) × (df − 1)."""

    def test_exact_removed_row_count(self, spark):
        from analyst_spark.functions.dedup import (
            containment_pairs,
            release_cached,
            shingles_exploded,
        )

        # docs 3..8 identical: their prefixes ARE hot shingles, so
        # the cap removes real prefix×postings rows
        hot = "common boiler plate text here"
        rows = [
            (1, "rare alpha beta gamma delta"),
            (2, "rare alpha beta gamma delta extra tail words"),
        ] + [(i, hot + " a b") for i in range(3, 9)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        capped = containment_pairs(
            df, threshold_num=4, threshold_den=5, max_posting_df=2
        )
        capped.count()
        acct = {r.shingle: r for r in capped._asp_dropped_postings.collect()}
        assert acct, "cap must report dropped postings"

        # recompute the ground truth with the same shingle machinery:
        # per hot shingle, prefix occurrences × (df − 1)
        sh = shingles_exploded(df, "text", "doc_id", 3).persist()
        dfreq = {
            r.shingle: r.cnt
            for r in sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        for shingle, r in acct.items():
            assert r.df == dfreq[shingle] > 2
            assert r.dropped_rows % (r.df - 1) == 0
            pocc = r.dropped_rows // (r.df - 1)
            # prefix occurrences can never exceed the shingle's df
            assert 0 < pocc <= r.df
            # strictly tighter than the old postings² figure
            assert r.dropped_rows <= r.df * (r.df - 1)
        sh.unpersist()
        release_cached(capped)


class TestPilDecoderRejectedOutright:
    """ADVICE r10 #4: decoder='pil' only gated the import; with Pillow
    installed the worker still called _decode_fake and failed per-row.
    Fixed: 'pil' is rejected outright until a real decode branch
    exists, and unknown decoders raise ValueError."""

    def test_dhash_pil_rejected(self, spark):
        from analyst_spark.functions.multimodal import (
            fake_images_frame,
            image_dhash_bands,
        )

        df = fake_images_frame(spark, n=1)
        with pytest.raises(NotImplementedError, match="not implemented"):
            image_dhash_bands(df, decoder="pil")

    def test_features_pil_rejected_and_unknown_valueerror(self, spark):
        from analyst_spark.functions.multimodal import (
            fake_images_frame,
            image_features,
        )

        df = fake_images_frame(spark, n=1)
        with pytest.raises(NotImplementedError):
            image_features(df, decoder="pil")
        with pytest.raises(ValueError, match="unknown decoder"):
            image_features(df, decoder="cv2")


class TestBandedHammingHotBucketCap:
    """VERDICT r10 #1: degenerate corpora (solid-color images /
    constant audio) collapse into one (band, val) bucket and the
    self-join goes quadratic. max_bucket_size skips oversize buckets
    with dropped-work accounting; default None is exact."""

    def _degenerate_plus_twins(self, spark, n_degenerate=40):
        # n_degenerate identical signatures (one quadratic bucket) +
        # one planted near-twin pair with distinct band values
        rows = [(i, 7, 7, 7, 7) for i in range(n_degenerate)]
        rows += [(1000, 100, 200, 300, 400), (1001, 100, 200, 300, 401)]
        return spark.createDataFrame(
            rows, "doc_id long, b0 int, b1 int, b2 int, b3 int"
        )

    def test_cap_skips_hot_bucket_and_accounts(self, spark):
        from analyst_spark.functions.dedup import release_cached
        from analyst_spark.functions.multimodal import banded_hamming_pairs

        sigs = self._degenerate_plus_twins(spark)
        out = banded_hamming_pairs(sigs, max_distance=3, max_bucket_size=8)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        # the planted twin pair shares three NON-hot bands -> kept
        assert (1000, 1001) in pairs
        # the degenerate block is dropped entirely (every shared band
        # is a hot bucket)
        assert not any(a < 1000 for a, _ in pairs)
        acct = out._asp_dropped_buckets.collect()
        assert len(acct) == 4  # all four bands of the 40-signature block
        for r in acct:
            assert r.bsz == 40 and r.dropped_pairs == 40 * 39 // 2
        release_cached(out)

    def test_default_none_exact_and_unannotated(self, spark):
        from analyst_spark.functions.dedup import release_cached
        from analyst_spark.functions.multimodal import banded_hamming_pairs

        sigs = self._degenerate_plus_twins(spark, n_degenerate=6)
        out = banded_hamming_pairs(sigs, max_distance=3)
        assert not hasattr(out, "_asp_dropped_buckets")
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        assert (1000, 1001) in pairs
        assert (0, 1) in pairs  # identical signatures, distance 0
        release_cached(out)

    def test_capped_recall_on_non_hot_pairs_is_one(self, spark):
        """Pairs sharing >= 1 non-hot band are found regardless of the
        cap — the pigeonhole argument restricted to kept buckets."""
        from analyst_spark.functions.dedup import release_cached
        from analyst_spark.functions.multimodal import banded_hamming_pairs

        rows = [(i, 7, 7, i, 1000 + i) for i in range(30)]  # hot b0/b1
        rows += [(500, 7, 7, 900, 901), (501, 7, 7, 900, 902)]
        sigs = spark.createDataFrame(
            rows, "doc_id long, b0 int, b1 int, b2 int, b3 int"
        )
        out = banded_hamming_pairs(sigs, max_distance=3, max_bucket_size=4)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        assert (500, 501) in pairs  # found via the non-hot b2 bucket
        release_cached(out)

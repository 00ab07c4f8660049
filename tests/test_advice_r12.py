"""Pins for the four ADVICE r11 items (all landed in round 12):

1. dedup.py incremental_neardup_ingest — a replayed day must leave
   the STATE (index + ledger) unchanged, not just suppress pair
   emission: the old code re-appended batch_sigs on replay, so later
   days' probes would emit duplicate rows for new pairs against the
   double-inserted docs.
2. multimodal_plans.py video plant margin — the flat-frame twin's
   frame-0 Hamming distance is EXACTLY 8 (one set bit per dHash
   row), not the "≥ 48 bits" the docstring used to claim.
3. classifier.py dense_quality_stats — zero-token documents must
   genuinely carry 0s (empty tokens filtered before counting).
4. catalog.py gate-window invariant — an explicit RuntimeError, not
   a bare assert strippable under python -O.
"""

from pyspark.sql import functions as F

from analyst_spark.functions.dedup import (
    neardup_signature_index,
    release_cached,
)

from tests.conftest import NEARDUP_LONG_A as LONG_A
from tests.conftest import drop_first_token as _drop_first


def test_replay_leaves_index_and_ledger_unchanged(spark):
    """ADVICE r11 #1: replaying a day against the POST-append index
    (state written, ack lost) must return an index with the same
    rows — no double-inserted signatures — and a ledger with no
    duplicated pair keys."""
    from analyst_spark.functions.dedup import incremental_neardup_ingest

    hist = spark.createDataFrame([(1, LONG_A)], ["doc_id", "text"])
    index0 = neardup_signature_index(hist)
    batch = spark.createDataFrame(
        [(100, _drop_first(LONG_A)), (105, _drop_first(LONG_A))],
        ["doc_id", "text"],
    )
    p1, index1, rep1 = incremental_neardup_ingest(
        index0, batch, None, min_match=5
    )
    p1.count()
    idx_rows = sorted(tuple(r) for r in index1.collect())
    led_rows = sorted(tuple(r) for r in rep1.collect())
    assert len({r[0] for r in idx_rows}) == len(idx_rows), "dup index ids"
    assert len(set(led_rows)) == len(led_rows), "dup ledger keys"
    # replay the same day against the post-append state
    p2, index2, rep2 = incremental_neardup_ingest(
        index1, batch, rep1, min_match=5
    )
    assert p2.collect() == []
    assert sorted(tuple(r) for r in index2.collect()) == idx_rows
    assert sorted(tuple(r) for r in rep2.collect()) == led_rows
    release_cached(p1)
    release_cached(p2)


def test_video_plant_frame0_hamming_is_exactly_8(spark):
    """ADVICE r11 #2: each 8-pixel dHash row of a generated frame
    carries exactly ONE set bit (pixel steps of +7 either stay
    monotone with only the row-end wraparound bit, or wrap mod 251
    once and set only the wrap bit), so the flat-123 twin's frame 0
    sits at Hamming distance exactly 8 from its source — the real
    plant margin over max_distance 3."""
    from analyst_spark.functions.multimodal import (
        encode_fake_video,
        video_frame_dhash_bands,
    )
    from analyst_spark.plans.multimodal_plans import _VDUP_OFFSET

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, bufs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                buf = bytearray(encode_fake_video(d, 8))
                ids.append(d)
                bufs.append(buf)
                twin = bytearray(buf)
                twin[20 : 20 + 64] = bytes([123]) * 64
                ids.append(d + _VDUP_OFFSET)
                bufs.append(twin)
            yield pd.DataFrame({"doc_id": ids, "video": bufs})

    docs = spark.createDataFrame([(0,), (33,), (121,)], ["doc_id"])
    sigs = video_frame_dhash_bands(
        docs.mapInPandas(gen, "doc_id long, video binary"), every_n=1
    )
    rows = {
        (r.doc_id, r.frame_idx): (r.b0, r.b1, r.b2, r.b3)
        for r in sigs.collect()
    }
    for src in (0, 33, 121):
        a = rows[(src, 0)]
        b = rows[(src + _VDUP_OFFSET, 0)]
        ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        assert ham == 8, (src, a, b, ham)
        # per-band: exactly one set bit per 8-pixel row, two rows per
        # 16-bit band, and the twin's bands are all-zero
        assert all(v == 0 for v in b), b
        assert [bin(v).count("1") for v in a] == [2, 2, 2, 2], a
        # frames past 0 are byte-identical between source and twin
        for f in range(1, 8):
            assert rows[(src, f)] == rows[(src + _VDUP_OFFSET, f)]


def test_dense_stats_zero_token_docs_carry_zeros(spark):
    """ADVICE r11 #3: empty/whitespace-only docs must have all-zero
    dense features — split of '' yields [""], which must be filtered
    before token counting."""
    from analyst_spark.functions.classifier import dense_quality_stats

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "a bb"), (3, "\t\n")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dense_quality_stats(docs).collect()}
    for d in (0, 1, 3):
        assert got[d].f_logtok == 0.0, got[d]
        assert got[d].f_meanlen == 0.0, got[d]
        assert got[d].f_ttr == 0.0, got[d]
    import math

    assert got[2].f_logtok == math.log1p(2) / 10.0
    assert got[2].f_meanlen == 3 / 20.0
    assert got[2].f_ttr == 1.0


def test_gate_window_check_raises_not_asserts():
    """ADVICE r11 #4: the first-50 invariant must survive python -O —
    check_gate_window raises RuntimeError, and the import-time call
    uses it (no bare module-level assert for this invariant)."""
    import inspect

    import pytest

    from analyst_spark.plans import catalog

    bad_queries = {f"q{i}": (lambda s, d: None) for i in range(10)}
    bad_oracles = {f"q{i}": "SELECT 1" for i in range(9)}  # q9 rows-only
    with pytest.raises(RuntimeError, match="q9"):
        catalog.check_gate_window(bad_queries, bad_oracles, window=10)
    # the real catalog passes
    catalog.check_gate_window(catalog.QUERIES, catalog.ORACLES)
    src = inspect.getsource(catalog)
    assert "check_gate_window(QUERIES, ORACLES)" in src
    assert "assert not _first50_rows_only" not in src

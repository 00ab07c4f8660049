"""Multimodal binary-column pipeline: schema contracts, Arrow-batched
decode/feature/resize, pruning-before-decode plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from analyst_spark.functions.multimodal import (
    audio_features,
    encode_fake_audio,
    encode_fake_image,
    fake_images_frame,
    frame_sample_plan,
    image_features,
    resize_images,
)


def test_image_features(spark):
    df = fake_images_frame(spark, n=16, width=4, height=3)
    out = image_features(df).collect()
    assert len(out) == 16
    r = {x.doc_id: x for x in out}[5]
    assert (r.width, r.height, r.channels) == (4, 3, 1)
    assert r.n_bytes == 8 + 12 + 12  # magic + header + pixels
    buf = encode_fake_image(5, 4, 3)
    expected_mean = sum(buf[20:]) / 12
    assert r.mean_luma == pytest.approx(expected_mean, abs=1e-6)


def test_resize_roundtrip(spark):
    df = fake_images_frame(spark, n=4, width=8, height=8)
    small = resize_images(df, 2, 2)
    feats = image_features(small).collect()
    for r in feats:
        assert (r.width, r.height) == (2, 2)
        assert r.n_bytes == 8 + 12 + 4


def test_pil_decoder_gated(spark):
    df = fake_images_frame(spark, n=1)
    with pytest.raises(NotImplementedError):
        image_features(df, decoder="pil")


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 25), (2, 5)], "doc_id long, n_frames int"
    )
    out = frame_sample_plan(vids, every_n=10).collect()
    got = {(r.doc_id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}


def test_audio_features(spark):
    rows = [(i, bytearray(encode_fake_audio(i, n_samples=200))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    out = {r.doc_id: r for r in audio_features(df).collect()}
    assert len(out) == 6
    r = out[3]
    assert r.n_samples == 200 and r.sample_rate == 16000
    samples = [((3 * 17 + i * 13) % 201) - 100 for i in range(200)]
    assert r.rms == pytest.approx(
        math.sqrt(sum(v * v for v in samples) / 200), abs=1e-6
    )
    assert r.zero_crossings == sum(
        1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0)
    )
    assert r.duration_s == pytest.approx(200 / 16000)


def test_audio_features_truncated_buffer_raises(spark):
    # ADVICE r14: a buffer shorter than its header's sample count must
    # fail loudly (the per-row struct.unpack used to raise); the
    # vectorized path must not silently average over fewer samples.
    import pyspark.errors

    good = encode_fake_audio(1, n_samples=200)
    rows = [(1, bytearray(good[:-10]))]  # header says 200, body short
    df = spark.createDataFrame(rows, "doc_id long, audio binary")
    with pytest.raises(pyspark.errors.PySparkException):
        audio_features(df).collect()


def test_ivf_topk_matches_bruteforce_on_probed_lists(spark):
    # IVF with n_probe == n_centroids degrades to exact search: every
    # inverted list is probed, so results must equal brute force.
    from analyst_spark.functions.similarity import cosine_topk, ivf_topk

    vecs = [
        (i, [math.sin(i * 7 + j) for j in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.rank): r.vec_id
        for r in cosine_topk(emb, q, k=5).collect()
    }
    ivf_all = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb, q, k=5, n_centroids=4, n_probe=4).collect()
    }
    assert ivf_all == exact
    # with fewer probes it still returns k results per query (approx)
    ivf_1 = ivf_topk(emb, q, k=5, n_centroids=4, n_probe=1).collect()
    assert {r.query_id for r in ivf_1} == {0, 1, 2}


def test_metadata_pruning_before_decode(spark):
    # The plan filters on metadata BEFORE mapInPandas — only matching
    # rows reach the decoder.
    df = fake_images_frame(spark, n=10, width=4, height=4)
    wide = df.withColumn("width_meta", F.lit(4)).filter(F.col("doc_id") < 3)
    out = image_features(wide.drop("width_meta")).collect()
    assert len(out) == 3


# ------------------------------------------ perceptual dedup (r10)


def test_dhash_bands_shape_and_determinism(spark):
    from analyst_spark.functions.multimodal import image_dhash_bands

    df = fake_images_frame(spark, n=12, width=8, height=8)
    sigs = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
            for r in image_dhash_bands(df).collect()}
    assert len(sigs) == 12
    assert all(0 <= v <= 0xFFFF for s in sigs.values() for v in s)
    again = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
             for r in image_dhash_bands(df).collect()}
    assert sigs == again


def test_dhash_resample_is_scale_stable(spark):
    # a 16x16 image whose 8x8 nearest-neighbor resample equals the
    # 8x8 original must produce the SAME signature — the perceptual
    # property raw md5 cannot have
    from analyst_spark.functions.multimodal import (
        FAKE_MAGIC,
        encode_fake_image,
        image_dhash_bands,
    )
    import struct

    small = encode_fake_image(5, 8, 8)
    pix = small[20:]
    big_payload = bytes(
        pix[(y // 2) * 8 + (x // 2)] for y in range(16) for x in range(16)
    )
    big = FAKE_MAGIC + struct.pack("<iii", 16, 16, 1) + big_payload
    df = spark.createDataFrame(
        [(1, bytearray(small)), (2, bytearray(big))],
        "doc_id long, image binary",
    )
    sigs = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
            for r in image_dhash_bands(df).collect()}
    assert sigs[1] == sigs[2]


def test_perceptual_pairs_recall_one_at_distance_3(spark):
    # plant a twin at EXACTLY hamming <= 2 (one pixel overwritten)
    # and an unrelated-signature control; the banded join must find
    # the twin (pigeonhole) and report the exact distance
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import (
        encode_fake_image,
        perceptual_dedup_pairs,
    )

    a = encode_fake_image(3, 8, 8)
    twin = bytearray(a)
    twin[20] = 255  # pixel 0
    rows = [(1, bytearray(a)), (2, twin)]
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    out = perceptual_dedup_pairs(df, max_distance=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 2
    release_cached(out)


def test_perceptual_catalog_plant_recovery(spark):
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.multimodal_plans import (
        _PDUP_OFFSET,
        _PDUP_STEP,
    )
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = QUERIES["multimodal_perceptual_dedup"](spark, sf)
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    release_cached(out)
    planted = [
        r.doc_id
        for r in load_tables(spark, sf)["documents"]
        .filter(F.col("doc_id") % _PDUP_STEP == 0)
        .select("doc_id")
        .collect()
    ]
    assert planted
    for d in planted:
        assert (d, d + _PDUP_OFFSET) in got, f"twin of {d} missed"
        assert got[(d, d + _PDUP_OFFSET)] <= 2


def test_audio_fingerprint_recall_and_plant(spark):
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import (
        audio_fingerprint_bands,
        banded_hamming_pairs,
        encode_fake_audio,
    )

    a = bytearray(encode_fake_audio(7))
    twin = bytearray(encode_fake_audio(7))
    twin[16:18] = (100).to_bytes(2, "little", signed=True)  # sample 0
    short = bytearray(encode_fake_audio(3, n_samples=40))  # < 65: dropped
    df = spark.createDataFrame(
        [(1, a), (2, twin), (3, short)], "doc_id long, audio binary"
    )
    sigs = {r.doc_id for r in audio_fingerprint_bands(df).collect()}
    assert sigs == {1, 2}, "sub-65-sample clip must be dropped"
    out = banded_hamming_pairs(audio_fingerprint_bands(df), max_distance=3)
    pairs = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    release_cached(out)
    assert (1, 2) in pairs and pairs[(1, 2)] <= 1


def test_audio_fingerprint_vs_python_model(spark):
    import struct as st

    from analyst_spark.functions.multimodal import (
        audio_fingerprint_bands,
        encode_fake_audio,
    )

    bufs = {i: encode_fake_audio(i * 3 + 1) for i in range(8)}
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in bufs.items()],
        "doc_id long, audio binary",
    )
    got = {
        r.doc_id: (r.b0, r.b1, r.b2, r.b3)
        for r in audio_fingerprint_bands(df).collect()
    }
    for i, b in bufs.items():
        _sr, n = st.unpack("<ii", b[8:16])
        flen = n // 65
        s = st.unpack(f"<{65 * flen}h", b[16 : 16 + 2 * 65 * flen])
        e = [
            sum(v * v for v in s[f * flen : (f + 1) * flen])
            for f in range(65)
        ]
        bits = [1 if e[b_] > e[b_ + 1] else 0 for b_ in range(64)]
        want = tuple(
            sum(bits[k * 16 + p] << p for p in range(16)) for k in range(4)
        )
        assert got[i] == want, i


# ---------------------- video perceptual near-dup (VERDICT r10 #5)


def _vid_sigs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, frame_idx int, b0 int, b1 int, b2 int, b3 int"
    )


def test_grouped_engine_is_frame_aligned(spark):
    """group_col: identical band values at DIFFERENT frame indexes
    must NOT pair — temporal alignment is part of the join key."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    sigs = _vid_sigs(
        spark,
        [
            (1, 0, 5, 6, 7, 8),
            (2, 2, 5, 6, 7, 8),  # same signature, different frame
            (3, 0, 5, 6, 7, 9),  # same frame 0, distance 1 from doc 1
        ],
    )
    out = banded_hamming_pairs(sigs, 3, group_col="frame_idx")
    got = {(r.frame_idx, r.id_a, r.id_b, r.hamming) for r in out.collect()}
    assert got == {(0, 1, 3, 1)}
    release_cached(out)


def test_video_majority_rule(spark):
    """3 shared frames: 2 matching -> kept (2*2 > 3); 1 matching ->
    rejected (2*1 < 3). Exact integer decision."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import video_perceptual_pairs

    rows = []
    for f in (0, 2, 4):
        rows.append((1, f, f + 1, 2, 3, 4))
        # doc 2: frames 0,2 match doc 1 exactly; frame 4 far away
        rows.append((2, f, f + 1 if f < 4 else 9999, 2, 3, 4 if f < 4 else 9998))
        # doc 3: only frame 0 matches doc 1
        rows.append((3, f, f + 1 if f == 0 else 7777, 2, 3, 4 if f == 0 else 7776))
    out = video_perceptual_pairs(_vid_sigs(spark, rows))
    got = {
        (r.id_a, r.id_b): (r.n_frames_matched, r.n_shared_frames)
        for r in out.collect()
    }
    release_cached(out)
    assert got[(1, 2)] == (2, 3)
    assert (1, 3) not in got  # minority match rejected


def test_video_codec_and_frame_signatures(spark):
    """Frame signatures from the codec equal a direct python dHash of
    the same closed-form pixels; sampling takes every 2nd frame."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import (
        encode_fake_video,
        video_frame_dhash_bands,
    )

    d, nf = 9, 5
    df = spark.createDataFrame(
        [(d, bytearray(encode_fake_video(d, nf)))],
        "doc_id long, video binary",
    )
    out = video_frame_dhash_bands(df, every_n=2)
    rows = {r.frame_idx: (r.b0, r.b1, r.b2, r.b3) for r in out.collect()}
    assert sorted(rows) == [0, 2, 4]

    def model(f):
        px = [(d * 31 + f * 11 + i * 7) % 251 for i in range(64)]
        bands = [0, 0, 0, 0]
        for b in range(64):
            nbr = (b // 8) * 8 + ((b % 8) + 1) % 8
            if px[b] > px[nbr]:
                bands[b // 16] |= 1 << (b % 16)
        return tuple(bands)

    for f in (0, 2, 4):
        assert rows[f] == model(f), f


def test_video_catalog_plants_recovered(spark):
    """Every planted flat-frame-0 twin surfaces with exactly one
    disagreeing frame: n_frames_matched = n_shared_frames - 1."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.multimodal_plans import (
        _VDUP_DOC_MOD,
        _VDUP_OFFSET,
        _VDUP_STEP,
    )
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = QUERIES["multimodal_video_perceptual_dedup"](spark, sf)
    got = {
        (r.id_a, r.id_b): (r.n_frames_matched, r.n_shared_frames)
        for r in out.collect()
    }
    release_cached(out)
    planted = [
        r.doc_id
        for r in load_tables(spark, sf)["documents"]
        .filter(
            (F.col("doc_id") % _VDUP_DOC_MOD == 0)
            & (F.col("doc_id") % _VDUP_STEP == 0)
        )
        .collect()
    ]
    assert planted
    for d in planted:
        key = (d, d + _VDUP_OFFSET)
        assert key in got, f"twin of {d} missed"
        n_match, n_shared = got[key]
        assert n_match == n_shared - 1, (d, got[key])


# ------------------- incremental perceptual ingest (r11)


def test_incremental_hamming_cross_probe(spark):
    """Batch-vs-index probe: twins across the boundary found at
    their exact distance; intra-index and intra-batch pairs are NOT
    produced (that's the self-join entry's job)."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import (
        incremental_hamming_pairs,
    )

    index = _vid_sigs(  # reuse the (doc, frame) helper shape minus frame
        spark, []
    )
    index = spark.createDataFrame(
        [(1, 10, 20, 30, 40), (2, 10, 20, 30, 40)],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    batch = spark.createDataFrame(
        [(100, 10, 20, 30, 41), (101, 999, 998, 997, 996)],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    out = incremental_hamming_pairs(index, batch)
    got = {(r.id_batch, r.id_hist): r.hamming for r in out.collect()}
    release_cached(out)
    assert got == {(100, 1): 1, (100, 2): 1}  # no (1,2), no 101 rows


def test_incremental_hamming_hot_bucket_cap(spark):
    """Hot INDEX buckets are skipped; dropped accounting counts the
    batch x index candidate rows removed."""
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import (
        incremental_hamming_pairs,
    )

    index = spark.createDataFrame(
        [(i, 7, 7, 7, 7) for i in range(20)]
        + [(500, 100, 200, 300, 400)],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    batch = spark.createDataFrame(
        [(1000, 7, 7, 7, 7), (1001, 100, 200, 300, 401)],
        "doc_id long, b0 int, b1 int, b2 int, b3 int",
    )
    out = incremental_hamming_pairs(index, batch, max_bucket_size=4)
    got = {(r.id_batch, r.id_hist) for r in out.collect()}
    assert (1001, 500) in got  # non-hot buckets pair normally
    assert not any(b == 1000 for b, _ in got)  # degenerate block capped
    acct = {(r.band, r.val): r for r in
            out._asp_dropped_buckets.collect()}
    release_cached(out)
    assert len(acct) == 4
    for r in acct.values():
        assert r.bsz == 20 and r.dropped_rows == 20  # 1 batch occ x 20


def test_incremental_perceptual_catalog_plants(spark):
    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.plans.catalog import QUERIES
    from analyst_spark.plans.multimodal_plans import (
        _IPD_OFFSET,
        _IPD_STEP,
    )
    from analyst_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    out = QUERIES["multimodal_incremental_perceptual"](spark, sf)
    got = {(r.id_batch, r.id_hist): r.hamming for r in out.collect()}
    release_cached(out)
    planted = [
        r.doc_id
        for r in load_tables(spark, sf)["documents"]
        .filter(
            (F.col("doc_id") % 4 != 0) & (F.col("doc_id") % _IPD_STEP == 0)
        )
        .collect()
    ]
    assert planted
    for d in planted:
        assert (d + _IPD_OFFSET, d) in got, f"twin of {d} missed"
        assert got[(d + _IPD_OFFSET, d)] <= 2


# ------- randomized differential: banded join == brute force (r11)


def test_banded_hamming_differential_randomized(spark):
    """Property: for ANY signature corpus, banded_hamming_pairs ==
    brute-force all-pairs at distance <= 3 (the pigeonhole claim,
    checked against numpy instead of trusted). Seeded corpus with
    deliberate band collisions (small value alphabet) so candidates,
    near-misses (distance 4-6 sharing a band), and exact dups all
    occur."""
    import random

    import numpy as np

    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    rng = random.Random(11)
    rows = []
    for i in range(120):
        # low-entropy bands: values from a 16-symbol alphabet with
        # scattered single-bit perturbations
        base = [rng.randrange(16) * 0x111 for _ in range(4)]
        if rng.random() < 0.5 and rows:
            src = rows[rng.randrange(len(rows))]
            base = list(src[1:])
            for _ in range(rng.randrange(0, 7)):  # distance 0..6
                k = rng.randrange(4)
                base[k] ^= 1 << rng.randrange(16)
        rows.append((i, *base))
    sigs = spark.createDataFrame(
        rows, "doc_id long, b0 int, b1 int, b2 int, b3 int"
    )
    out = banded_hamming_pairs(sigs, max_distance=3)
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    release_cached(out)

    arr = np.array([r[1:] for r in rows], dtype=np.int64)
    want = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            d = sum(int(bin(int(x) ^ int(y)).count("1"))
                    for x, y in zip(arr[a], arr[b]))
            if d <= 3:
                want[(a, b)] = d
    assert got == want and want  # non-trivial: pairs must exist


def test_banded_hamming_grouped_differential(spark):
    """Same property under group_col: pairs only within equal group
    values, per-group brute force agrees exactly."""
    import random

    from analyst_spark.functions.dedup import release_cached
    from analyst_spark.functions.multimodal import banded_hamming_pairs

    rng = random.Random(23)
    rows = []
    for i in range(60):
        g = rng.randrange(3)
        base = [rng.randrange(8) * 0x249 for _ in range(4)]
        if rng.random() < 0.6 and rows:
            src = rows[rng.randrange(len(rows))]
            base = list(src[2:])
            for _ in range(rng.randrange(0, 5)):
                k = rng.randrange(4)
                base[k] ^= 1 << rng.randrange(16)
        rows.append((i, g, *base))
    sigs = spark.createDataFrame(
        rows,
        "doc_id long, frame_idx int, b0 int, b1 int, b2 int, b3 int",
    )
    out = banded_hamming_pairs(sigs, 3, group_col="frame_idx")
    got = {
        (r.frame_idx, r.id_a, r.id_b): r.hamming for r in out.collect()
    }
    release_cached(out)
    want = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            if rows[a][1] != rows[b][1]:
                continue
            d = sum(bin(x ^ y).count("1")
                    for x, y in zip(rows[a][2:], rows[b][2:]))
            if d <= 3:
                want[(rows[a][1], a, b)] = d
    assert got == want and want


def test_wide_band_dhash_and_plant_recovery(spark):
    """r12 wide-band option (VERDICT r11 #1): image_dhash_bands at
    band_bits=32 emits a 128-bit dHash as four LONG bands; a
    1-pixel-perturbed twin sits at hamming <= 2 and the identical
    engine recovers it; band_bits outside {16, 32} is rejected."""
    import pytest as _pytest

    from analyst_spark.functions.multimodal import (
        banded_hamming_pairs,
        encode_fake_image,
        image_dhash_bands,
    )
    from analyst_spark.functions.dedup import release_cached

    rows = []
    for d in range(6):
        buf = bytearray(encode_fake_image(d, 8, 16))
        rows.append((d, bytes(buf)))
        if d % 2 == 0:
            twin = bytearray(buf)
            twin[20] = 255
            rows.append((d + 1000, bytes(twin)))
    df = spark.createDataFrame(rows, "doc_id long, image binary")
    sigs = image_dhash_bands(df, band_bits=32)
    assert [f.dataType.simpleString() for f in sigs.schema.fields] == [
        "bigint"
    ] * 5
    by_id = {r.doc_id: (r.b0, r.b1, r.b2, r.b3) for r in sigs.collect()}
    for d in (0, 2, 4):
        ham = sum(
            bin(x ^ y).count("1")
            for x, y in zip(by_id[d], by_id[d + 1000])
        )
        assert 1 <= ham <= 2, (d, ham)
    out = banded_hamming_pairs(image_dhash_bands(df, band_bits=32), 3)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    release_cached(out)
    assert {(0, 1000), (2, 1002), (4, 1004)} <= got
    with _pytest.raises(ValueError, match="band_bits"):
        image_dhash_bands(df, band_bits=64)


def test_wide_band_values_need_longs(spark):
    """A grid engineered to set the top bit of a 32-bit band proves
    the long schema is load-bearing (an int band would overflow):
    band value >= 2^31 survives the pipeline intact."""
    import struct

    import numpy as np

    from analyst_spark.functions.multimodal import (
        FAKE_MAGIC,
        image_dhash_bands,
    )

    # pixel grid where every gradient bit is 1 except none — descending
    # rows with wraparound: p[y][x] = 200 - x*7 > p[y][(x+1)%8] for
    # x < 7; bit 31 of band 0 lives at grid row 3, col 7 (the
    # wraparound comparison p[3][7] > p[3][0] must be FALSE for a
    # descending row) — instead make row 3 ASCENDING so its wrap bit
    # (col 7) is 1: value has bit 31 set.
    px = np.zeros((16, 8), dtype=np.uint8)
    for y in range(16):
        if y == 3:
            px[y] = np.arange(8) * 7  # ascending: only wrap bit set
        else:
            px[y] = 100
    buf = FAKE_MAGIC + struct.pack("<iii", 8, 16, 1) + px.tobytes()
    df = spark.createDataFrame([(1, bytes(buf))], "doc_id long, image binary")
    r = image_dhash_bands(df, band_bits=32).collect()[0]
    assert r.b0 == 1 << 31, r
    assert r.b1 == r.b2 == r.b3 == 0, r

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

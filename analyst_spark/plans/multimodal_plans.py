"""Oracle-checked plans for the multimodal binary-column operators.

The image bytes are the deterministic fake codec from
:mod:`analyst_spark.functions.multimodal` (pixel i of doc d =
``(d*31 + i*7) % 251``), so every stage of the binary pipeline —
encode, decode/feature-extract, resize — has a closed-form ANSI-SQL
twin DuckDB can compute from ``documents.doc_id`` alone. That makes
the mapInPandas plumbing itself hash-verifiable, not just rows-only.

Image sizes are powers of two (8x8 → 4x4) so pixel means are exact
binary fractions and float hashing can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from analyst_spark.functions.multimodal import (
    frame_sample_plan,
    image_features,
    resize_images,
)
from analyst_spark.tables import load_tables, spread


def _fake_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mime, image binary) — synthetic images generated
    executor-side (mapInPandas), one per document row; stands in for
    reading a binary column out of parquet."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")

    def gen(batches):
        import pandas as pd

        from analyst_spark.functions.multimodal import encode_fake_image

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": "image/x-fake",
                    "image": [
                        bytearray(encode_fake_image(int(d), 8, 8))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    return spread(docs, "doc_id").mapInPandas(
        gen, "doc_id long, mime string, image binary"
    )


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode + feature extraction over Arrow batches."""
    return image_features(_fake_corpus(spark, sf_dir))


# pixel i of doc d is (d*31 + i*7) % 251; 8x8x1 image, 20-byte header.
MULTIMODAL_FEATURES_ORACLE = """
SELECT d.doc_id,
       8 AS width, 8 AS height, 1 AS channels,
       round(avg(CAST((d.doc_id * 31 + g.i * 7) % 251 AS DOUBLE)), 6)
           AS mean_luma,
       CAST(84 AS BIGINT) AS n_bytes
FROM documents d
CROSS JOIN (SELECT unnest(range(64)) AS i) g
GROUP BY d.doc_id
"""


def multimodal_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained binary ops: 8x8 → 4x4 nearest-neighbor resize, then
    feature-extract the resized bytes — verifies the binary-out path
    end-to-end (the resized payload feeds a second decode)."""
    resized = resize_images(_fake_corpus(spark, sf_dir), 4, 4)
    return image_features(resized)


# nearest-neighbor 8→4: output pixel (y,x) samples source index
# (2y)*8 + 2x = 16*(i//4) + 2*(i%4) for flat output index i in 0..15.
MULTIMODAL_RESIZE_ORACLE = """
SELECT d.doc_id,
       4 AS width, 4 AS height, 1 AS channels,
       round(avg(CAST(
           (d.doc_id * 31 + (16 * (g.i // 4) + 2 * (g.i % 4)) * 7) % 251
           AS DOUBLE)), 6) AS mean_luma,
       CAST(36 AS BIGINT) AS n_bytes
FROM documents d
CROSS JOIN (SELECT unnest(range(16)) AS i) g
GROUP BY d.doc_id
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: every 10th frame index, generated in
    Catalyst BEFORE any decode — the prune-then-decode shape that
    matters at 100 TB (frames you drop are never read)."""
    videos = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", (F.col("doc_id") % 240 + 1).alias("n_frames")
    )
    return frame_sample_plan(videos, every_n=10)


MULTIMODAL_FRAMES_ORACLE = """
SELECT doc_id,
       unnest(range(0, (doc_id % 240) + 1, 10)) AS frame_idx
FROM documents
"""

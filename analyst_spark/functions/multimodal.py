"""Multimodal columns: image/audio/video as opaque ``binary`` cells
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is real and tested — schema contracts,
partition-balanced batching, UDF signatures, metadata extraction.
The codec layer (actual JPEG/audio decode) is NOT available in this
container (no PIL/cv2/ffmpeg), so `decode_image` ships two modes:

* ``fake`` (default): a deterministic stand-in that parses our own
  tiny header format — exercises every byte of the pipeline.
* ``pil``: the real decoder, import-gated, raising NotImplementedError
  with a clear message when PIL is absent.

At 100 TB: binaries live in parquet/iceberg with the metadata columns
beside them, so planning prunes on metadata (width/duration/mime)
WITHOUT touching bytes; only surviving rows' binary cells are read
(parquet column projection), then decoded executor-side in Arrow
batches.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_MAGIC = b"FAKEIMG1"

FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "mean_luma double, n_bytes long"
)


def encode_fake_image(doc_id: int, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic 'image': header + u8 pixel payload.
    Stands in for JPEG bytes so the binary-column pipeline is testable
    in this container."""
    n = width * height
    payload = bytes(((doc_id * 31 + seed + i * 7) % 251) for i in range(n))
    return FAKE_MAGIC + struct.pack("<iii", width, height, 1) + payload


def fake_images_frame(spark, n: int = 64, width: int = 8, height: int = 8) -> DataFrame:
    """A binary-column DataFrame shaped like a multimodal corpus:
    (doc_id, mime, image binary)."""
    rows = [
        (i, "image/x-fake", bytearray(encode_fake_image(i, width, height)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, mime string, image binary")


def _decode_fake(buf: bytes) -> tuple[int, int, int, float]:
    if buf[:8] != FAKE_MAGIC:
        raise ValueError("not a fake image")
    w, h, c = struct.unpack("<iii", buf[8:20])
    pixels = buf[20 : 20 + w * h * c]
    mean = sum(pixels) / max(len(pixels), 1)
    return w, h, c, mean


def image_features(
    df: DataFrame,
    image_col: str = "image",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode + feature-extract binary images via mapInPandas
    (Arrow-batched; one python worker per partition, no per-row
    pickling)."""
    if decoder == "pil":  # pragma: no cover — codec not in container
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow, which is not "
                "installed in this container; use decoder='fake' for "
                "the pipeline plumbing"
            ) from e

    def run(batches: Iterator["pandas.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[image_col]):
                b = bytes(buf)
                w, h, c, mean = _decode_fake(b)
                out.append((int(doc_id), w, h, c, round(mean, 6), len(b)))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "mean_luma", "n_bytes",
                ],
            )

    from analyst_spark.tables import spread

    return spread(df, id_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    image_col: str = "image",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor resize of fake images (the transform-shaped
    multimodal op: binary in → binary out, metadata updated)."""

    def run(batches: Iterator["pandas.DataFrame"]):  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, bufs = [], []
            for doc_id, buf in zip(pdf[id_col], pdf[image_col]):
                b = bytes(buf)
                w, h, c, _ = _decode_fake(b)
                pixels = b[20:]
                out = bytearray()
                for y in range(target_h):
                    sy = min(int(y * h / target_h), h - 1)
                    for x in range(target_w):
                        sx = min(int(x * w / target_w), w - 1)
                        out.append(pixels[sy * w + sx])
                ids.append(int(doc_id))
                bufs.append(
                    FAKE_MAGIC + struct.pack("<iii", target_w, target_h, 1) + bytes(out)
                )
            yield pd.DataFrame({"doc_id": ids, "image": bufs})

    from analyst_spark.tables import spread

    return spread(df, id_col).mapInPandas(run, schema="doc_id long, image binary")


FAKE_AUDIO_MAGIC = b"FAKEAUD1"

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, "
    "rms double, zero_crossings long, duration_s double"
)


def encode_fake_audio(
    doc_id: int, n_samples: int = 1000, sample_rate: int = 16000
) -> bytes:
    """Deterministic synthetic 'audio': header + int16 PCM samples in
    [-100, 100]. Sample i of doc d = ((d*17 + i*13) % 201) - 100 —
    integer-exact, so every derived feature has a closed-form SQL
    twin."""
    samples = [((doc_id * 17 + i * 13) % 201) - 100 for i in range(n_samples)]
    return (
        FAKE_AUDIO_MAGIC
        + struct.pack("<ii", sample_rate, n_samples)
        + struct.pack(f"<{n_samples}h", *samples)
    )


def _decode_fake_audio(buf: bytes) -> tuple[int, tuple]:
    if buf[:8] != FAKE_AUDIO_MAGIC:
        raise ValueError("not a fake audio buffer")
    sr, n = struct.unpack("<ii", buf[8:16])
    return sr, struct.unpack(f"<{n}h", buf[16 : 16 + 2 * n])


def audio_features(
    df: DataFrame, audio_col: str = "audio", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + feature-extract binary audio via mapInPandas: RMS
    level, zero-crossing count, duration. Integer accumulation then
    one exactly-rounded division/sqrt, so results match a SQL oracle
    bit-for-bit (sums stay < 2^53)."""

    def run(batches: Iterator["pandas.DataFrame"]):  # noqa: F821
        import math

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf[id_col], pdf[audio_col]):
                sr, s = _decode_fake_audio(bytes(buf))
                n = len(s)
                sq = sum(v * v for v in s)
                zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
                out.append(
                    (
                        int(doc_id), n, sr,
                        round(math.sqrt(sq / n), 6), zc, round(n / sr, 6),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "rms", "zero_crossings", "duration_s",
                ],
            )

    from analyst_spark.tables import spread

    return spread(df, id_col).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan* shape: explode (id, frame_idx) for
    idx % every_n == 0 — pure Catalyst, the decode happens in a later
    mapInPandas over the sampled (id, idx) pairs only. Demonstrates
    pruning-before-decode: at scale you never decode frames you drop."""
    return (
        df.select(F.col(id_col), F.col("n_frames"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )

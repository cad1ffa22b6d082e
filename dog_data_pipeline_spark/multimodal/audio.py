"""Audio operators over BINARY columns (north-star multimodal: the
audio analog of ``video.py``'s scan/probe/feature chain).

Same partitioning contract as video: compressed/container blobs are the
only thing that crosses task boundaries; decode + feature-extraction are
fused into one Arrow-batched pass (``extract_audio_features``), so raw
waveforms never shuffle. Real codecs (mp3/flac/wav via soundfile or
ffmpeg) are NOT in this environment — the ``FAKEAUD`` container
exercises the full plumbing with real data flow, and the real path is
gated exactly like ``codec._require_cv2``.

FAKEAUD layout: ``FAKEAUD|sample_rate|n_samples`` + ``\\n`` + n_samples
little-endian int16 samples.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    IntegerType,
    StructField,
    StructType,
)

AUDIO_MAGIC = b"FAKEAUD"

AUDIO_META_SCHEMA = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
    ]
)

AUDIO_FEATURES_SCHEMA = (
    "audio_id STRING, sample_rate INT, n_samples INT, duration_sec DOUBLE, "
    "rms DOUBLE, peak INT, zero_crossings INT"
)


def make_fake_audio(sample_rate: int, samples: "np.ndarray") -> bytes:
    arr = np.asarray(samples, dtype="<i2")
    head = b"|".join([AUDIO_MAGIC, str(sample_rate).encode(), str(arr.size).encode()])
    return head + b"\n" + arr.tobytes()


def probe_audio_bytes(content: bytes) -> tuple[int, int]:
    """-> (sample_rate, n_samples) from the header only — no waveform
    decode (the audio analog of the video header probe)."""
    if content.startswith(AUDIO_MAGIC):
        head, _, _ = content.partition(b"\n")
        _, sr, n = head.split(b"|")
        return int(sr), int(n)
    return _real_probe_audio(content)


def decode_audio(content: bytes) -> tuple[int, "np.ndarray"]:
    """-> (sample_rate, int16 waveform)."""
    if content.startswith(AUDIO_MAGIC):
        head, _, body = content.partition(b"\n")
        _, sr, n = head.split(b"|")
        return int(sr), np.frombuffer(body, dtype="<i2", count=int(n))
    return _real_decode_audio(content)


def probe_audio(binary_df: DataFrame, content_col: str = "content") -> DataFrame:
    """Header-only metadata probe, vectorized over Arrow batches."""

    @F.pandas_udf(AUDIO_META_SCHEMA)
    def _probe(content: pd.Series) -> pd.DataFrame:
        rows = [probe_audio_bytes(bytes(c)) for c in content]
        return pd.DataFrame(rows, columns=["sample_rate", "n_samples"])

    return (
        binary_df.withColumn("meta", _probe(F.col(content_col)))
        .select("*", "meta.*")
        .drop("meta")
    )


def extract_audio_features(
    binary_df: DataFrame,
    audio_id_col: str = "audio_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused decode + feature extraction in ONE mapInPandas pass: the
    waveform exists only inside the task; the output rows are tiny
    scalars. Features: duration, RMS, peak magnitude, zero-crossing
    count — the standard cheap audio-quality/speech-detection signals.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "audio_id": [], "sample_rate": [], "n_samples": [],
                "duration_sec": [], "rms": [], "peak": [], "zero_crossings": [],
            }
            for aid, content in zip(pdf[audio_id_col], pdf[content_col]):
                sr, wave = decode_audio(bytes(content))
                x = wave.astype(np.float64)
                out["audio_id"].append(aid)
                out["sample_rate"].append(sr)
                out["n_samples"].append(wave.size)
                out["duration_sec"].append(wave.size / sr)
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if wave.size else 0.0)
                out["peak"].append(int(np.abs(wave).max()) if wave.size else 0)
                signs = np.sign(x[x != 0])
                out["zero_crossings"].append(
                    int(np.count_nonzero(signs[1:] != signs[:-1]))
                )
            yield pd.DataFrame(out)

    return binary_df.select(audio_id_col, content_col).mapInPandas(
        _extract, AUDIO_FEATURES_SCHEMA
    )


def resample_audio(
    binary_df: DataFrame,
    factor: int,
    audio_id_col: str = "audio_id",
    content_col: str = "content",
) -> DataFrame:
    """Decimate-by-``factor`` resample (the frame-sample analog): keeps
    every ``factor``-th sample and rewrites the container with
    sample_rate/​factor. Decode → slice → re-encode happens inside one
    Arrow batch; only containers cross the exchange."""

    @F.pandas_udf("binary")
    def _resample(content: pd.Series) -> pd.Series:
        out = []
        for c in content:
            sr, wave = decode_audio(bytes(c))
            out.append(make_fake_audio(max(sr // factor, 1), wave[::factor]))
        return pd.Series(out)

    return binary_df.withColumn(content_col, _resample(F.col(content_col)))


def fingerprint_audio(
    binary_df: DataFrame,
    frame_len: int = 32,
    audio_id_col: str = "audio_id",
    content_col: str = "content",
    out: str = "afp",
) -> DataFrame:
    """Acoustic fingerprint per clip: 56-bit energy-difference hash
    (the time-axis simplification of Haitsma & Kalker's robust audio
    hash, the scheme behind Philips/Shazam-style matching): the clip is
    cut into 57 fixed-length frames, per-frame energy E_f = sum(x^2)
    (exact int64 — int16 squares cannot overflow a long at any sane
    frame length), and

        bit(f) = [E_{f+1} > E_f]   for f in 0..55.

    Re-encodes, level shifts, and small edits keep most energy-gradient
    signs, so near-duplicate audio lands within a few bits of hamming
    distance — pair generation reuses ``operators.dedup
    .simhash_pairs_pigeonhole`` (guaranteed recall at hamming <= h),
    the same banded machinery as text SimHash and image dHash: one
    hamming-space engine serving all three modalities.

    All-integer arithmetic -> SQL-replayable closed-form. Decode +
    frame + hash fuse into one mapInPandas pass; waveforms never leave
    the task, only (id, int64) rows shuffle. Clips shorter than
    57*frame_len samples raise (fingerprints of unequal frame grids
    are not comparable).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    n_frames = 57
    id_field = binary_df.schema[audio_id_col]
    schema = StructType([id_field, StructField(out, LongType())])
    shifts = np.arange(n_frames - 1, dtype=np.uint64)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, content in zip(pdf[audio_id_col], pdf[content_col]):
                _, wave = decode_audio(bytes(content))
                need = n_frames * frame_len
                if wave.size < need:
                    raise ValueError(
                        f"clip too short for fingerprint: {wave.size} < {need}"
                    )
                x = wave[:need].astype(np.int64)
                energy = (x * x).reshape(n_frames, frame_len).sum(axis=1)
                bits = (energy[1:] > energy[:-1]).astype(np.uint64)
                ids.append(aid)
                hashes.append(int((bits << shifts).sum()))
            yield pd.DataFrame({audio_id_col: ids, out: hashes})

    return binary_df.select(audio_id_col, content_col).mapInPandas(_fp, schema)


def _require_audio_codec():
    try:
        import soundfile  # noqa: F401

        return soundfile
    except ImportError as e:  # pragma: no cover - env without soundfile
        raise NotImplementedError(
            "real audio codecs need soundfile/ffmpeg, which this "
            "environment does not ship; only the FAKEAUD container is "
            "supported"
        ) from e


def _real_probe_audio(content: bytes):  # pragma: no cover - needs soundfile
    import io

    sf = _require_audio_codec()
    info = sf.info(io.BytesIO(content))
    return int(info.samplerate), int(info.frames)


def _real_decode_audio(content: bytes):  # pragma: no cover - needs soundfile
    import io

    sf = _require_audio_codec()
    data, sr = sf.read(io.BytesIO(content), dtype="int16", always_2d=False)
    if data.ndim > 1:  # downmix to mono: the byte-grid contract is 1-D
        data = data.mean(axis=1).astype("int16")
    return int(sr), data


def frame_energy(
    binary_df: DataFrame,
    frame_len: int = 32,
    audio_id_col: str = "audio_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused decode + per-frame energy in ONE mapInPandas pass:
    (audio_id, frame_idx, energy) with energy = sum of squared int16
    samples over each ``frame_len``-sample frame (trailing partial
    frame dropped) — all-integer, so a formula-generated FAKEAUD oracle
    replays it exactly. Waveforms never leave the task; one long per
    frame shuffles (the audio analog of video.frame_mean_luma)."""
    id_field = binary_df.schema[audio_id_col]
    schema = StructType(
        [
            id_field,
            StructField("frame_idx", IntegerType()),
            StructField("energy", LongType()),
        ]
    )

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, es = [], [], []
            for aid, content in zip(pdf[audio_id_col], pdf[content_col]):
                _sr, wave = decode_audio(bytes(content))
                n_frames = len(wave) // frame_len
                w = wave[: n_frames * frame_len].astype(np.int64)
                frames = w.reshape(n_frames, frame_len)
                energy = (frames * frames).sum(axis=1)
                ids.extend([aid] * n_frames)
                idxs.extend(range(n_frames))
                es.extend(int(e) for e in energy)
            yield pd.DataFrame(
                {audio_id_col: ids, "frame_idx": idxs, "energy": es}
            )

    return binary_df.select(audio_id_col, content_col).mapInPandas(_energy, schema)


def detect_active_segments(
    energy: DataFrame,
    threshold: int,
    audio_id_col: str = "audio_id",
) -> DataFrame:
    """Energy-threshold activity segmentation (the VAD-style silence
    split every speech/audio curation pipeline runs before sampling
    training clips): frames with energy > threshold are active, and
    maximal consecutive runs of active frames become segments —
    (audio_id, segment_idx, start_frame, end_frame, n_frames).

    Reuses the gaps-and-islands merge from the span-dedup engine
    (window_tokens=1: a run of consecutive integers IS a 1-width span
    chain), so the segmentation windows partition by clip — parallel
    across clips, bounded by frames-per-clip within."""
    from dog_data_pipeline_spark.operators.dedup import merge_positions_to_spans

    active = energy.filter(F.col("energy") > threshold).select(
        F.col(audio_id_col).alias("id"), F.col("frame_idx").alias("pos")
    )
    spans = merge_positions_to_spans(active, window_tokens=1)
    w = Window.partitionBy("id").orderBy("span_start")
    return spans.withColumn(
        "segment_idx", F.row_number().over(w) - 1
    ).select(
        F.col("id").alias(audio_id_col),
        "segment_idx",
        F.col("span_start").alias("start_frame"),
        F.col("span_end").alias("end_frame"),
        (F.col("span_end") - F.col("span_start") + 1).alias("n_frames"),
    )

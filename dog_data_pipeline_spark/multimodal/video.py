"""Video operators over BINARY columns (SURVEY S7-S9, F1-F5).

Partitioning contract (SURVEY §4.2 / §7.4): inference state must never
cross a (video, segment) boundary — every UDF here is either per-row
(probe) or explicitly repartitioned on its state key before a
mapInPandas/applyInPandas whose iterator owns the model lifecycle:
the model loads ONCE per task, not once per segment (the reference
reloads per segment, its own comment flags it —
``raw_to_samples.py:169-170``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from dog_data_pipeline_spark.multimodal import codec

METADATA_SCHEMA = StructType(
    [
        StructField("frame_count", IntegerType()),
        StructField("frame_height", IntegerType()),
        StructField("frame_width", IntegerType()),
        StructField("video_fps", IntegerType()),
    ]
)

FRAMES_SCHEMA = (
    "video_id STRING, frame_idx INT, frame BINARY, frame_width INT, frame_height INT"
)

DETECTIONS_SCHEMA = (
    "video_id STRING, frame_idx INT, subject_id INT, bbox ARRAY<DOUBLE>, cls INT"
)

ENCODED_SCHEMA = "video_id STRING, subject_id INT, n_frames INT, video BINARY"


def probe_metadata(binary_df: DataFrame, content_col: str = "content") -> DataFrame:
    """Metadata probe (S8/F5): one struct per video WITHOUT decoding
    frames — the reference decodes everything twice (probe then re-read,
    ``raw_to_samples.py:328-329,349-353``); here the probe reads only
    the header bytes, vectorized over Arrow batches."""

    # Bind the codec FUNCTIONS locally. NOTE this is stylistic, not the
    # importability mechanism: cloudpickle pickles module-level functions
    # BY REFERENCE whether captured in a closure cell or reached through
    # the module object, so python workers still need the package
    # importable — `session.ensure_package_on_executors(spark)` (addPyFile
    # zip) is what actually guarantees that when the driver's cwd isn't
    # the repo root. (Nested `def`s are the exception: those do pickle by
    # value — see streaming/stateful.py.)
    probe = codec.probe

    @F.pandas_udf(METADATA_SCHEMA)
    def _probe(content: pd.Series) -> pd.DataFrame:
        rows = [probe(c) for c in content]
        return pd.DataFrame(rows, columns=["frame_count", "frame_height", "frame_width", "video_fps"])

    return binary_df.withColumn("meta", _probe(F.col(content_col))).select(
        "*", "meta.*"
    ).drop("meta")


def decode_frames(
    binary_df: DataFrame,
    video_id_col: str = "video_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame-iterator scan (S7): 1 video row → N frame rows via
    mapInPandas (UDTF shape — output cardinality independent of input)."""

    probe, decode_video = codec.probe, codec.decode_video

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for vid, content in zip(pdf[video_id_col], pdf[content_col]):
                n, h, w, _fps = probe(content)
                _fps, frames = decode_video(content)
                yield pd.DataFrame(
                    {
                        "video_id": [vid] * len(frames),
                        "frame_idx": range(len(frames)),
                        "frame": frames,
                        "frame_width": [w] * len(frames),
                        "frame_height": [h] * len(frames),
                    }
                )

    return binary_df.select(video_id_col, content_col).mapInPandas(
        _decode, FRAMES_SCHEMA
    )


def fake_detector_factory() -> Callable[[bytes, int, int], list[tuple[int, list[float], int]]]:
    """Deterministic stand-in for a YOLO tracker: emits stable subject
    identities with bboxes derived from the frame's byte content (so
    tests can assert real data flow). Per frame:
    - subject 1: always present, always class 16 (a complete dog track);
    - subject 2: always present, class 16 in ~3/4 of frames (exercises
      the frequency threshold);
    - subject 3: present only in ~half the frames (dropped by the
      completeness filter).
    Returns (subject_id, bbox, cls) tuples.
    """

    def detect(frame: bytes, width: int, height: int):
        if not frame:
            return []
        s = sum(frame[:16])
        x1 = float(s % max(width - 8, 1))
        y1 = float((s // 7) % max(height - 8, 1))
        out = [
            (1, [x1, y1, x1 + 6.0, y1 + 5.0], 16),
            (2, [x1 / 2, y1 / 2, x1 / 2 + 4.0, y1 / 2 + 4.0], 16 if s % 4 else 0),
        ]
        if s % 2:
            out.append((3, [1.0, 1.0, 3.0, 3.0], 16))
        return out

    return detect


def run_tracking(
    frames_df: DataFrame,
    detector_factory: Callable[[], Callable] = fake_detector_factory,
    num_partitions: int | None = None,
) -> DataFrame:
    """Tracking-inference UDTF (F1): frame rows → detection rows.

    - repartition on video_id so one task owns a video's full frame
      sequence (tracker identity state stays in-task, SURVEY T3);
    - the detector is constructed ONCE per task inside the iterator —
      the load-once-per-partition fix for the reference's per-segment
      model reload;
    - frames are sorted by frame_idx within the task before inference:
      tracking is order-sensitive (SURVEY §7.4 order hazard).
    """
    parted = frames_df.repartition(
        num_partitions or frames_df.sparkSession.sparkContext.defaultParallelism,
        "video_id",
    ).sortWithinPartitions("video_id", "frame_idx")

    def _track(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = detector_factory()  # once per task
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "subject_id": [], "bbox": [], "cls": []}
            for vid, idx, frame, w, h in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["frame"], pdf["frame_width"], pdf["frame_height"]
            ):
                for sub, bbox, cls in model(bytes(frame), int(w), int(h)):
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["subject_id"].append(sub)
                    out["bbox"].append(bbox)
                    out["cls"].append(cls)
            yield pd.DataFrame(out)

    return parted.mapInPandas(_track, DETECTIONS_SCHEMA)


def track_videos(
    binary_df: DataFrame,
    detector_factory: Callable[[], Callable] = fake_detector_factory,
    num_partitions: int | None = None,
    video_id_col: str = "video_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused decode+track (S7+F1 in one exchange): video blobs →
    detection rows without frames ever crossing a task boundary.

    The composed shape (``decode_frames`` → repartition → ``run_tracking``)
    shuffles DECODED frames — at scale the raw tensors are 100-1000× the
    compressed blob, so that shuffle is the pipeline's dominant I/O. Here
    the COMPRESSED blobs are repartitioned by video, and one mapInPandas
    task decodes and runs inference per video:

    - decode order is frame order, so the order-sensitive tracker
      (SURVEY §7.4) needs no sortWithinPartitions;
    - the detector is constructed once per task (the fix for the
      reference's per-segment model reload, ``raw_to_samples.py:169-170``);
    - one Python exchange instead of two, and the Arrow transfer carries
      blobs + small detection rows, never frames.
    """
    parted = binary_df.select(video_id_col, content_col).repartition(
        num_partitions or binary_df.sparkSession.sparkContext.defaultParallelism,
        video_id_col,
    )

    probe, decode_video = codec.probe, codec.decode_video

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = detector_factory()  # once per task
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "subject_id": [], "bbox": [], "cls": []}
            for vid, content in zip(pdf[video_id_col], pdf[content_col]):
                content = bytes(content)
                _n, h, w, _fps = probe(content)
                _fps, frames = decode_video(content)
                for idx, frame in enumerate(frames):
                    for sub, bbox, cls in model(frame, w, h):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["subject_id"].append(sub)
                        out["bbox"].append(bbox)
                        out["cls"].append(cls)
            yield pd.DataFrame(out)

    return parted.mapInPandas(_run, DETECTIONS_SCHEMA)


def sample_tracks(
    binary_df: DataFrame,
    tracks_df: DataFrame,
    fps: int = 30,
    video_id_col: str = "video_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused crop+encode via cogroup (F3+F4 in one exchange): each task
    receives a video's compressed blob ONCE plus all its selected track
    rows (video_id, frame_idx, segment_id, subject_id, new_bbox), decodes
    locally, crops, and emits one encoded clip per (video, segment,
    subject) — matching ``encode_tracks``'s output exactly.

    The composed shape (``crop_tracks`` → ``encode_tracks``) joins every
    DECODED frame against its boxes (replicating frame bytes per
    overlapping track) and then shuffles the crops again for the encode
    groupBy. Cogroup ships the blob once and the tiny track rows once;
    decoding twice per video (here and in ``track_videos``) is deliberate
    — recompute beats shuffling frames, the same trade the reference
    makes with its two-pass read (``raw_to_samples.py:328-329,349-353``).
    """

    probe, decode_video = codec.probe, codec.decode_video
    crop_frame, encode_video = codec.crop_frame, codec.encode_video

    def _sample(videos_pdf: pd.DataFrame, tracks_pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["video_id", "segment_id", "subject_id", "n_frames", "video"]
        if videos_pdf.empty or tracks_pdf.empty:
            return pd.DataFrame({c: [] for c in cols})
        content = bytes(videos_pdf[content_col].iloc[0])
        vid = videos_pdf[video_id_col].iloc[0]
        _n, h, w, _fps = probe(content)
        _fps, frames = decode_video(content)
        out = {c: [] for c in cols}
        for (seg, sub), g in tracks_pdf.groupby(["segment_id", "subject_id"]):
            g = g.sort_values("frame_idx")
            bbox0 = g["new_bbox"].iloc[0]
            crop_w = int(bbox0[2] - bbox0[0])
            crop_h = int(bbox0[3] - bbox0[1])
            crops = [
                crop_frame(
                    frames[int(i)], w, tuple(int(v) for v in b)
                )
                for i, b in zip(g["frame_idx"], g["new_bbox"])
            ]
            out["video_id"].append(vid)
            out["segment_id"].append(int(seg))
            out["subject_id"].append(int(sub))
            out["n_frames"].append(len(crops))
            out["video"].append(encode_video(fps, crop_w, crop_h, crops))
        return pd.DataFrame(out)

    return (
        binary_df.select(video_id_col, content_col)
        .groupBy(video_id_col)
        .cogroup(tracks_df.groupBy(video_id_col))
        .applyInPandas(_sample, SEGMENT_ENCODED_SCHEMA)
    )


def crop_tracks(frames_df: DataFrame, tracks_df: DataFrame) -> DataFrame:
    """Crop UDF (F3): (frame, bbox) → crop bytes. The join key
    (video_id, frame_idx) co-locates each frame with its per-subject
    boxes; the crop itself is an Arrow-batched scalar UDF."""

    crop_frame = codec.crop_frame

    @F.pandas_udf(BinaryType())
    def _crop(frame: pd.Series, width: pd.Series, bbox: pd.Series) -> pd.Series:
        return pd.Series(
            [
                crop_frame(bytes(f), int(w), tuple(int(v) for v in b))
                for f, w, b in zip(frame, width, bbox)
            ]
        )

    joined = frames_df.join(tracks_df, ["video_id", "frame_idx"])
    return joined.withColumn(
        "crop", _crop(F.col("frame"), F.col("frame_width"), F.col("new_bbox"))
    )


SEGMENT_ENCODED_SCHEMA = (
    "video_id STRING, segment_id INT, subject_id INT, n_frames INT, video BINARY"
)


def encode_tracks(
    crops_df: DataFrame,
    fps: int = 30,
) -> DataFrame:
    """Encode UDAF (F4/S9): ordered crop rows → one encoded video blob
    per track via applyInPandas. The track key is (video, segment,
    subject) when a segment_id column is present — one sample clip per
    segment-track, matching the reference's
    '{video}_{seg:03}_{sub:03}.mp4' outputs (``raw_to_samples.py:366``) —
    else (video, subject). Frames are sorted by frame_idx inside the
    group: the zero-padded-filename sort the reference leans on
    (``raw_to_samples.py:126,254``) made explicit."""

    has_segment = "segment_id" in crops_df.columns
    keys = (
        ["video_id", "segment_id", "subject_id"]
        if has_segment
        else ["video_id", "subject_id"]
    )

    encode_video = codec.encode_video

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("frame_idx")
        frames = [bytes(c) for c in pdf["crop"]]
        w = int(pdf["crop_w"].iloc[0])
        h = int(pdf["crop_h"].iloc[0])
        blob = encode_video(fps, w, h, frames)
        out = {
            "video_id": [pdf["video_id"].iloc[0]],
            "subject_id": [int(pdf["subject_id"].iloc[0])],
            "n_frames": [len(frames)],
            "video": [blob],
        }
        if has_segment:
            out["segment_id"] = [int(pdf["segment_id"].iloc[0])]
        return pd.DataFrame(out)

    with_dims = crops_df.withColumn(
        "crop_w", F.col("new_bbox")[2] - F.col("new_bbox")[0]
    ).withColumn("crop_h", F.col("new_bbox")[3] - F.col("new_bbox")[1])
    schema = SEGMENT_ENCODED_SCHEMA if has_segment else ENCODED_SCHEMA
    return with_dims.groupBy(*keys).applyInPandas(_encode, schema)


TRANSCODE_SCHEMA = (
    "video_id STRING, content BINARY, ok BOOLEAN, error STRING"
)


def transcode_videos(
    binary_df: DataFrame,
    fps: int | None = None,
    video_id_col: str = "video_id",
    content_col: str = "content",
) -> DataFrame:
    """Transcode UDF (S13/F2): decode whatever container each blob is in
    and re-encode into the canonical one, with PER-ROW error routing —
    a failed decode emits (ok=false, error) instead of aborting the job,
    mirroring the reference's try/except → exceptions-dir dead-letter
    around its .mov→.mp4 conversion (``preprocess_dataset.py:55-70``).
    Feed the ok=false side to the dead-letter sink; the blob passes
    through unchanged there so nothing is lost.

    FAKEVID round-trips natively; real containers engage the cv2-gated
    codec path. One mapInPandas pass — frames exist only inside the task.
    """

    probe, decode_video = codec.probe, codec.decode_video
    encode_video = codec.encode_video

    def _transcode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "content": [], "ok": [], "error": []}
            for vid, content in zip(pdf[video_id_col], pdf[content_col]):
                content = bytes(content)
                out["video_id"].append(vid)
                try:
                    n, h, w, src_fps = probe(content)
                    dec_fps, frames = decode_video(content)
                    blob = encode_video(fps or dec_fps, w, h, frames)
                    out["content"].append(blob)
                    out["ok"].append(True)
                    out["error"].append(None)
                except Exception as e:  # noqa: BLE001 - dead-letter boundary
                    out["content"].append(content)
                    out["ok"].append(False)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return binary_df.select(video_id_col, content_col).mapInPandas(
        _transcode, TRANSCODE_SCHEMA
    )


def frame_mean_luma(
    binary_df: DataFrame,
    video_id_col: str = "video_id",
    content_col: str = "content",
) -> DataFrame:
    """Fused decode + per-frame mean luma in ONE mapInPandas pass:
    (video_id, frame_idx, mean_luma). Frames never leave the task —
    only one double per frame shuffles (same no-content-shuffle design
    as the dHash/audio fingerprint passes). Sums are integer and the
    divisor w*h is exact in a double, so the mean is bit-reproducible
    cross-engine when frames are formula-generated (FAKEVID oracles).
    """
    import numpy as np

    id_field = binary_df.schema[video_id_col]
    schema = StructType(
        [
            id_field,
            StructField("frame_idx", IntegerType()),
            StructField("mean_luma", DoubleType()),
        ]
    )

    decode_video = codec.decode_video

    def _mean(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for vid, content in zip(pdf[video_id_col], pdf[content_col]):
                _fps, frames = decode_video(bytes(content))
                for i, f in enumerate(frames):
                    px = np.frombuffer(f, dtype=np.uint8)
                    ids.append(vid)
                    idxs.append(i)
                    means.append(float(int(px.sum(dtype=np.int64))) / len(px))
            yield pd.DataFrame(
                {video_id_col: ids, "frame_idx": idxs, "mean_luma": means}
            )

    return binary_df.select(video_id_col, content_col).mapInPandas(_mean, schema)


def detect_scene_cuts(
    luma: DataFrame,
    threshold: float,
    video_id_col: str = "video_id",
) -> DataFrame:
    """Scene segmentation from per-frame luma statistics (the classic
    mean-luma-jump cut detector — the cheap first pass every video
    curation pipeline runs before sampling clips): a cut lands wherever
    |mean_luma - lag(mean_luma)| > threshold, and scenes are the runs
    between cuts. Returns (video_id, scene_idx, start_frame, end_frame,
    n_frames).

    Plan: two windows partitioned by video (lag + running cut count) —
    parallel across videos, bounded by frames-per-video within — and
    one partial-aggregated groupBy. The decoded frames stay inside
    ``frame_mean_luma``'s task; this stage only ever sees one double
    per frame.
    """
    w = Window.partitionBy(video_id_col).orderBy("frame_idx")
    cuts = luma.withColumn(
        "is_cut",
        (
            F.abs(F.col("mean_luma") - F.lag("mean_luma").over(w))
            > F.lit(threshold)
        ).cast("int"),
    ).withColumn(
        "scene_idx",
        F.coalesce(
            F.sum("is_cut").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            F.lit(0),
        ),
    )
    return cuts.groupBy(video_id_col, "scene_idx").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
    )

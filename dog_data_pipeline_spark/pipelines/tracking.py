"""Stage 3 — the flagship pipeline: detections → filtered, transformed,
ledgered sample tracks.

Re-expresses the core of ``src/raw_to_samples.py`` (:270-288, :310-401)
over a long-format detections table (FIXTURES.md B4) instead of an eager
per-video loop. The parallelism unit is (video, segment) — matching the
reference's design where tracker state never crosses a segment
(``raw_to_samples.py:336-341``) — so every aggregation/window below
partitions on those keys and one shuffle co-locates everything.

Edge semantics preserved exactly (SURVEY §7.4):
- +1 overlap frame: segment s covers frames [s*n, min(s*n+n+1, frame_count))
  — its last frame is segment s+1's first (``:339``);
- trailing segment with fewer than n frames is dropped (``:340-341``);
- dog filter: strict count/total > threshold over detected frames (``:145-151``);
- completeness: subject present in EVERY frame of the segment (``:211-216``);
- max extent int-truncated then +10 pad (``:72``);
- recenter-clamp preserving extent, ceil-based (``:23-50``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.functions.geometry import recenter_clamp


def segment_frames(
    detections: DataFrame,
    metadata: DataFrame,
    segment_length_sec: int = 2,
) -> DataFrame:
    """Assign detection rows to tumbling segments with the reference's
    +1-overlap and trailing-drop semantics.

    Input: detections(video_id, frame_idx, subject_id, bbox, cls),
    metadata(video_id, frame_count, frame_height, frame_width, video_fps).
    Output: input columns + segment_id, seg_n_frames (the segment's true
    frame count after end-clamping), frame dims. One broadcast join; the
    overlap frame is produced by exploding a 1- or 2-element segment
    array — no self-join.
    """
    d = detections.join(F.broadcast(metadata), "video_id")
    n = (F.col("video_fps") * segment_length_sec).cast("int")
    d = d.withColumn("__n", n)
    seg0 = F.floor(F.col("frame_idx") / F.col("__n")).cast("int")
    is_overlap = (F.col("frame_idx") % F.col("__n") == 0) & (seg0 >= 1)
    segs = F.when(is_overlap, F.array(seg0 - 1, seg0)).otherwise(F.array(seg0))
    d = d.withColumn("segment_id", F.explode(segs))
    start = F.col("segment_id") * F.col("__n")
    end = F.least(start + F.col("__n") + 1, F.col("frame_count"))
    return (
        d.withColumn("seg_n_frames", (end - start).cast("int"))
        .filter(F.col("seg_n_frames") >= F.col("__n"))
        .filter((F.col("frame_idx") >= start) & (F.col("frame_idx") < end))
        .drop("__n")
    )


def select_complete_dog_tracks(
    segmented: DataFrame,
    label: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """Keep (video, segment, subject) tracks that are (a) the target
    class in > threshold of their detected frames and (b) present in
    EVERY frame of the segment. One partial-aggregated shuffle on the
    (video, segment, subject) key.
    """
    keys = ["video_id", "segment_id", "subject_id"]
    stats = segmented.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_det"),
        F.avg(F.when(F.col("cls") == label, 1.0).otherwise(0.0)).alias("freq"),
        F.first("seg_n_frames").alias("seg_n_frames"),
    )
    return stats.filter(
        (F.col("freq") > threshold) & (F.col("n_det") == F.col("seg_n_frames"))
    ).select(*keys)


def transform_tracks_max_extent(segmented: DataFrame, selected: DataFrame) -> DataFrame:
    """Resize every selected track's bboxes to the track's max extent
    (+10px pad), recentered and clamped into the frame.

    The reference's build-dict-then-probe two-pass (``:59-90``) becomes
    one groupBy on the track key + a broadcast-able join back — the agg
    output is tiny (one row per track) so Spark broadcasts it; no second
    scan of the detections.
    """
    keys = ["video_id", "segment_id", "subject_id"]
    sel = segmented.join(selected, keys)
    extents = sel.groupBy(*keys).agg(
        (F.max(F.abs(F.col("bbox")[2] - F.col("bbox")[0])).cast("int") + 10).alias("pad_w"),
        (F.max(F.abs(F.col("bbox")[3] - F.col("bbox")[1])).cast("int") + 10).alias("pad_h"),
    )
    return sel.join(extents, keys).withColumn(
        "new_bbox",
        recenter_clamp(
            F.col("bbox"),
            F.col("pad_w"),
            F.col("pad_h"),
            F.col("frame_width"),
            F.col("frame_height"),
        ),
    )


def track_samples_pipeline(
    detections: DataFrame,
    metadata: DataFrame,
    catalog: DataFrame,
    label: int = 16,
    threshold: float = 0.3,
    segment_length_sec: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Full stage-3 flow → (samples_ledger, errors_ledger).

    samples: one row per qualifying (video, segment, subject) with the
    reference's ledger schema (``raw_to_samples.py:385-388``):
    file_path='{video}_{seg:03}_{sub:03}.mp4', original_file, segment
    ('%03d'), dataset, action.
    errors: segments with no qualifying subject — the dead-letter branch
    (``:372-374``, the "can't detect a dog" failure class).
    """
    segmented = segment_frames(detections, metadata, segment_length_sec)
    selected = select_complete_dog_tracks(segmented, label, threshold)

    cat = F.broadcast(catalog.select("video_id", "dataset", "action"))
    seg3 = F.lpad(F.col("segment_id").cast("string"), 3, "0")
    sub3 = F.lpad(F.col("subject_id").cast("string"), 3, "0")

    samples = (
        selected.join(cat, "video_id")
        .select(
            F.concat(
                F.col("video_id"), F.lit("_"), seg3, F.lit("_"), sub3, F.lit(".mp4")
            ).alias("file_path"),
            F.col("video_id").alias("original_file"),
            seg3.alias("segment"),
            "dataset",
            "action",
        )
    )

    all_segments = segmented.select("video_id", "segment_id").distinct()
    ok_segments = selected.select("video_id", "segment_id").distinct()
    errors = (
        all_segments.join(ok_segments, ["video_id", "segment_id"], "left_anti")
        .join(cat, "video_id")
        .select(
            F.col("video_id").alias("original_file"),
            seg3.alias("segment"),
            "dataset",
            "action",
            F.lit("no qualifying subjects").alias("error"),
        )
    )
    return samples, errors

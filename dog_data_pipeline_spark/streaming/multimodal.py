"""Streaming multimodal ingestion: video blobs landing in a directory
become detection/sample rows continuously, with exactly-once file-sink
semantics.

The reference's media pipeline is batch-only (``raw_to_samples.py`` runs
over a finished directory); a production training-data feed instead
receives media continuously. This module wires the FUSED batch operators
(``multimodal.video.track_videos`` — frames never shuffle) into
Structured Streaming:

* the source is blob-parquet (``video_id``, ``content`` binary), read
  with ``readStream`` + an explicit schema (file streams require one;
  it is resolved from the existing files' footer once at plan time);
* ``track_videos``'s ``repartition`` + ``mapInPandas`` are stateless,
  so the same fused operator runs unchanged per micro-batch — one code
  path for batch backfill and streaming tail;
* the sink is parquet-with-checkpoint: Spark's file-sink commit log
  gives exactly-once per input file, so a crashed ingest resumes
  without duplicating detections (T4 resume semantics on the media
  path);
* ``trigger(availableNow=True)`` drains the current backlog and stops —
  the cron-friendly "catch up, then exit" mode; pass
  ``continuous=True`` for a long-running tail with per-trigger file
  caps (bounds memory: each micro-batch holds at most
  ``max_files_per_trigger`` videos' blobs in flight).

At 100 TB the same topology holds: the stream shuffles only compressed
blobs (the fused operator's invariant) and state is bounded by the
file-source offset log, not by data volume — there is no watermark
state because detection is per-video, not cross-video.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from dog_data_pipeline_spark.multimodal.video import (
    fake_detector_factory,
    track_videos,
)


def stream_blob_table(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over a blob-parquet directory.

    Streaming file sources require a declared schema; it is taken from
    the footers of whatever files already exist (one cheap batch
    planning read — the standard bootstrap for parquet streams).
    """
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def track_stream(
    blob_stream: DataFrame,
    detector_factory: Callable[[], Callable] = fake_detector_factory,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fused decode+track over a streaming blob source — the batch
    operator applied verbatim (repartition + mapInPandas are stateless,
    so Structured Streaming accepts the same plan per micro-batch)."""
    return track_videos(
        blob_stream,
        detector_factory=detector_factory,
        num_partitions=num_partitions,
    )


def ingest_video_detections(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    checkpoint: str,
    detector_factory: Callable[[], Callable] = fake_detector_factory,
    max_files_per_trigger: int | None = None,
    continuous: bool = False,
    num_partitions: int | None = None,
) -> StreamingQuery:
    """End-to-end streaming media ingest: blob dir → detections parquet.

    Exactly-once per input file via the checkpointed file sink; rerunning
    with the same checkpoint after a crash (or on a schedule with
    ``availableNow``) processes only files not yet committed.
    """
    blobs = stream_blob_table(
        spark, src_path, max_files_per_trigger=max_files_per_trigger
    )
    detections = track_stream(
        blobs, detector_factory=detector_factory, num_partitions=num_partitions
    )
    writer = (
        detections.writeStream.format("parquet")
        .option("path", dst_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if not continuous:
        writer = writer.trigger(availableNow=True)
    return writer.start()

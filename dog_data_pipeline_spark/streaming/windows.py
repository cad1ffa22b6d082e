"""Streaming window operators over event-time (SURVEY T1/T2/T6 + the
sliding/session extensions the reference lacks).

The batch forms (operators/windows.py) bucket with epoch arithmetic; the
streaming forms here use ``F.window``/``F.session_window`` + watermarks
so state is bounded and late data is handled by the engine: a watermark
of W means windows close once event-time passes window_end + W — the
streaming version of the reference's drop-incomplete-trailing-segment
rule (``raw_to_samples.py:339-341``), generalized to out-of-order input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over events-shaped parquet.

    The ts physical type has varied across driver data drops
    (TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS) in round 2), so the
    stream schema is probed from the existing files with a batch
    footer-only read, then normalized to TimestampType exactly like
    tables.load. The probe is one driver-side footer read at stream
    construction — nothing per-batch.
    """
    from dog_data_pipeline_spark.tables import normalize_events_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed_ts = spark.read.parquet(path).schema["ts"].dataType
    schema = StructType(
        [
            f if f.name != "ts" else StructField("ts", probed_ts)
            for f in EVENTS_STREAM_SCHEMA
        ]
    )
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.load(path))


def tumbling_agg(
    events: DataFrame,
    duration: str = "2 seconds",
    watermark: str = "10 seconds",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window grouped aggregation with watermark (T1/T2/T6)."""
    keys = keys or ["user_id"]
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.max("value").alias("value_max"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "value_sum",
            "value_max",
        )
    )


def flagship_stream(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "10 minutes",
    freq_type: str = "click",
    threshold: float = 0.3,
    min_events: int = 2,
) -> DataFrame:
    """Streaming twin of the flagship batch query: per (window, user),
    conditional frequency (A2) + completeness threshold (A3) + padded max
    (A1) — same expressions, incremental execution with watermark-bounded
    state. Demonstrates the engine's batch/streaming unification: the
    aggregation expressions are identical to queries.flagship_segment_stats.
    """
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg(F.when(F.col("event_type") == freq_type, 1.0).otherwise(0.0)).alias(
                "freq"
            ),
            F.max("value").alias("max_value"),
        )
    )
    return agg.filter(
        (F.col("freq") > threshold) & (F.col("n_events") >= min_events)
    ).select(
        F.col("win.start").alias("win_start"),
        "user_id",
        "n_events",
        F.round("freq", 4).alias("click_freq"),
        F.round(F.col("max_value") + 10.0, 2).alias("padded_max"),
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "10 seconds",
    slide: str = "5 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Sliding-window aggregation (not in the reference; part of the
    engine's generic streaming surface)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup (the streaming face of the engine's dedup
    family): first occurrence of each key wins, duplicates arriving
    within the watermark horizon are dropped, and state for keys older
    than the watermark is evicted — bounded state, unlike an unbounded
    ``dropDuplicates`` whose key set grows forever. Keyed on the event
    id by default; state is hash-partitioned by key exactly like the
    batch exact-dedup's groupBy.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_agg(
    events: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Session-window aggregation keyed by user (generic surface)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )

"""Streaming benchmark decontamination: screen a document stream
against a STATIC benchmark corpus and emit each micro-batch with the
quoted eval material surgically removed (the streaming face of
operators.contamination.scrub_contaminated_spans — SURVEY §2.9
extension, same pattern as streaming/dedup_incremental.py).

Why foreachBatch and not a plain stream-static transform: span merging
is a gaps-and-islands window over each document's flagged positions,
and window functions are unsupported on an unbounded streaming
DataFrame — but inside foreachBatch the micro-batch is an ordinary
bounded DataFrame, so the exact batch operator runs unchanged (no
re-implementation to drift out of sync). State story: NONE — the
benchmark is static and scrubbing is per-document, so there is no
cross-batch state at all; a replayed batch re-produces byte-identical
rows (idempotent downstream via the (doc, batch) key).

Scale shape per batch: the benchmark's distinct window fingerprints are
computed once per batch and broadcast (benchmarks are MBs); the batch
side is the map-only sliding-window explode + broadcast semi-join +
per-doc islands merge. At 100 TB/day the stream is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scrub_stream_contaminated(
    stream: DataFrame,
    benchmark: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    window_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: str = "md5",
    trigger_available_now: bool = True,
):
    """Start the scrub stream; returns the StreamingQuery.

    Appends to ``out_path`` parquet rows of the input schema plus
    (clean_text, n_removed_tokens, batch_id). At-least-once: a crashed
    batch replays and appends the same rows again — readers dedup on
    (id_col, batch_id) or (id_col) since rows are deterministic.
    """
    from dog_data_pipeline_spark.operators.contamination import (
        scrub_contaminated_spans,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        scrubbed = scrub_contaminated_spans(
            batch,
            benchmark,
            window_tokens=window_tokens,
            id_col=id_col,
            text_col=text_col,
            fingerprint=fingerprint,
        ).withColumn("batch_id", F.lit(batch_id))
        scrubbed.write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

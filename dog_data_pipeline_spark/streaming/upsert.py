"""Streaming upsert sink: maintain a sharded parquet corpus from a
stream of document updates (SURVEY §2.9 extension — the incremental
corpus-maintenance path).

Structured Streaming's file sink is append-only; keyed upserts need
foreachBatch. Each micro-batch runs the sharded upsert from
sources/sharding.py: only shards containing updated keys are rewritten,
so steady-state maintenance cost tracks the update rate, not the corpus
size. Batches replay after a crash re-apply the same keys onto the same
shards (the upsert is idempotent per (key, payload)), which is what
makes foreachBatch's at-least-once delivery safe here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_sink(
    stream: DataFrame,
    path: str,
    key_col: str,
    checkpoint: str,
    num_shards: int = 16,
    trigger_available_now: bool = True,
):
    """Start the upsert sink; returns the StreamingQuery.

    Within one micro-batch, duplicate keys are resolved before the
    upsert (keep the max-by-key row — deterministic) so replays and
    in-batch dupes cannot fan out.
    """
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.sources.sharding import upsert_sharded

    other = [c for c in stream.columns if c != key_col]

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if not batch.columns:
            return
        deduped = (
            batch.groupBy(key_col)
            .agg(F.max(F.struct(*other)).alias("__r"))
            .select(key_col, "__r.*")
        )
        upsert_sharded(
            batch.sparkSession, path, deduped, key_col, num_shards=num_shards
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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


def span_dedup_stream_incremental(
    stream: DataFrame,
    index_path: str,
    spans_path: str,
    checkpoint: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 16,
    fingerprint: str = "rolling",
    trigger_available_now: bool = True,
):
    """Incremental SUBSTRING-level dedup over a document stream: flag
    each micro-batch's duplicate spans against every window fingerprint
    ingested before it — the span-granularity member of the incremental
    family (doc-level: streaming/dedup_incremental.py; this completes
    doc / segment / span).

    Semantics: earlier batches win outright (their windows are already
    in the index); WITHIN a batch, first occurrence by (id, pos) wins —
    together equivalent to running `duplicate_spans` over the stream
    prefix, restricted to spans of the current batch.

    Crash story mirrors dedup_stream_incremental: spans append FIRST,
    the batch's window fingerprints LAST, and a replayed batch's own
    windows are anti-joined out of the index view, so an at-least-once
    replay re-emits identical spans instead of missing or inventing
    any. Index layout: append-only parquet of DISTINCT (h) per batch —
    the fattest index of the family (O(tokens) rows per doc; the
    rolling engine keeps each row one short string); at scale,
    partition by hash range so the probe join partition-prunes.

    Per-batch cost: O(batch tokens x window) fingerprint work + one
    join of batch windows against the index keyed on h — never a
    corpus re-scan.
    """
    from dog_data_pipeline_spark.operators.dedup import (
        merge_positions_to_spans,
        window_fingerprints,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        # deterministic survivor per duplicate id: dropDuplicates keeps
        # an ARBITRARY row, so a crash-replay could keep a different
        # text and emit different spans under the same batch_id —
        # breaking the byte-identical at-least-once replay contract.
        # min(struct(<other cols>)) pins the survivor independent of
        # partition/arrival order.
        others = [c for c in batch.columns if c != id_col]
        if others:
            docs = (
                batch.groupBy(id_col)
                .agg(F.min(F.struct(*others)).alias("_row"))
                .select(id_col, *[F.col(f"_row.{c}").alias(c) for c in others])
            )
        else:
            docs = batch.dropDuplicates([id_col])
        wins = window_fingerprints(
            docs, id_col, text_col, window_tokens, fingerprint
        )
        from dog_data_pipeline_spark.sources.sharding import _hadoop_fs

        fs, hpath = _hadoop_fs(spark, index_path)
        if fs.exists(hpath):
            # reconstruct the "before this batch" index state: a crashed
            # replay may find its OWN windows already appended (crash
            # between the spans and index writes), and those rows — and
            # ONLY those rows — must be excluded, keyed by src_batch
            # (an h-keyed anti-join would also drop hashes an EARLIER
            # batch legitimately owns, silently un-flagging true spans
            # on replay)
            # no .distinct(): the left_semi probe is unaffected by
            # duplicate build-side keys, and a distinct here would
            # shuffle the ENTIRE accumulated index every batch (rows
            # are already distinct per batch at write time)
            seen = (
                spark.read.parquet(index_path)
                .filter(F.col("src_batch") != batch_id)
                .select("h")
            )
        else:
            seen = None
        # within-batch winners: global min (id, pos) per fingerprint
        firsts = wins.groupBy("h").agg(
            F.min(F.struct("id", "pos")).alias("w0"),
            F.count(F.lit(1)).alias("cnt"),
        )
        dup_in_batch = (
            wins.join(firsts.filter(F.col("cnt") > 1), "h")
            .filter(
                (F.col("id") != F.col("w0.id")) | (F.col("pos") != F.col("w0.pos"))
            )
            .select("id", "pos")
        )
        if seen is not None:
            dup_vs_index = wins.join(seen, "h", "left_semi").select("id", "pos")
            dup = dup_in_batch.unionByName(dup_vs_index).dropDuplicates(
                ["id", "pos"]
            )
        else:
            dup = dup_in_batch
        spans = merge_positions_to_spans(dup, window_tokens).withColumn(
            "batch_id", F.lit(batch_id)
        )
        spans.write.mode("append").parquet(spans_path)
        wins.select("h").distinct().withColumn(
            "src_batch", F.lit(batch_id)
        ).write.mode("append").parquet(index_path)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

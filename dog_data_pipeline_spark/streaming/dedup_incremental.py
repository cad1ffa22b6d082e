"""Streaming incremental near-dedup: maintain a MinHash signature index
from a document stream and flag each micro-batch's near-duplicates
against everything ingested before it (SURVEY §2.9 extension — the
streaming face of operators.dedup.minhash_lsh_pairs_incremental).

The batch operator's contract carries over exactly: per-batch cost is
O(batch signatures) + one bucket join against the persisted index,
never a corpus re-scan. foreachBatch drives two writes per batch —
flagged pairs appended to a dup-pairs log, the batch's signatures
appended to the index — with the signature append LAST, so an
at-least-once replay of a crashed batch re-emits the same pairs
(idempotent downstream via dropDuplicates on the pair key) instead of
silently missing batch-vs-batch pairs: replays see the same
index state as the first attempt because a batch's own signatures are
committed only after its pairs are.

Index layout: plain append-only parquet of (id, sig, band hashes
exploded) — at scale, partition by band_hash range so the bucket join
partition-prunes; here the layout keeps the bucketed-join shape without
requiring a metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_incremental(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    est_threshold: float = 0.5,
    trigger_available_now: bool = True,
):
    """Start the incremental-dedup stream; returns the StreamingQuery.

    Emits to ``pairs_path`` rows (id_a, id_b, est_jaccard, batch_id)
    where id_b is always a doc from the batch that discovered the pair
    and id_a is a previously-ingested doc or an earlier doc of the same
    batch. ``index_path`` accumulates (id, sig) — the persisted
    signature table later batches (or the batch operator) join against.
    """
    from dog_data_pipeline_spark.operators.dedup import (
        incremental_lsh_pairs_from_tagged_sigs,
        minhash_signatures,
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        # in-batch id dedup: replayed or duplicated ids must not produce
        # self-pairs or double signatures
        docs = batch.dropDuplicates([id_col])
        b_sig = minhash_signatures(docs, id_col, text_col, n, num_hashes)
        # existence probe through the Hadoop FS API, not os.path — the
        # index root is routinely HDFS/S3 where the driver's local
        # filesystem sees nothing
        from dog_data_pipeline_spark.sources.sharding import _hadoop_fs

        fs, hpath = _hadoop_fs(spark, index_path)
        if fs.exists(hpath):
            seen = spark.read.parquet(index_path)
            # a replayed batch's own signatures may already be in the
            # index (crash between the two writes): anti-join them out
            # so the replay sees the same "before this batch" state
            seen = seen.join(b_sig.select("id"), "id", "left_anti")
            tagged = seen.withColumn("is_new", F.lit(False)).unionByName(
                b_sig.withColumn("is_new", F.lit(True))
            )
        else:
            tagged = b_sig.withColumn("is_new", F.lit(True))
        pairs = incremental_lsh_pairs_from_tagged_sigs(
            tagged, num_hashes, bands, est_threshold
        ).withColumn("batch_id", F.lit(batch_id))
        # pairs FIRST, signatures LAST (see module docstring)
        pairs.write.mode("append").parquet(pairs_path)
        b_sig.write.mode("append").parquet(index_path)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dup_pairs(spark, pairs_path: str) -> DataFrame:
    """The dup-pairs log with replay fan-out removed: at-least-once
    delivery can append the same pair twice; the pair key (id_a, id_b)
    is the idempotence key, keeping the earliest discovery."""
    raw = spark.read.parquet(pairs_path)
    return (
        raw.groupBy("id_a", "id_b")
        .agg(
            F.min("batch_id").alias("batch_id"),
            F.first("est_jaccard").alias("est_jaccard"),
        )
    )

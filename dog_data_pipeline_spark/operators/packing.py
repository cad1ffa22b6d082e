"""Sequence packing: group context-window chunks into ~budget-token
training sequences (the step between chunking and the sharded export —
trainers want dense, fixed-budget sequences, not ragged documents).

True first-fit bin packing is inherently sequential; the scalable
standard (T5/GPT data pipelines) is shard-parallel greedy packing:

1. every chunk gets a deterministic shard (pmod of xxhash64 of its
   identity — same contract as the sharded export);
2. WITHIN a shard, chunks are laid out in a deterministic pseudo-random
   order and a running token total assigns bin = floor(prefix/budget).

The only non-map operation is the per-shard cumulative-sum window.
Its partition is ONE SHARD — bounded by choosing num_shards ~
corpus_tokens / target_shard_tokens, exactly the knob the SemDeDup
cells and the export sharding already use — so no single task ever
sees more than a shard of data. Greedy layout means a bin can overrun
``budget`` by at most one chunk; trainers truncate or pad, both of
which need the overrun bound, not exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    chunks: DataFrame,
    tokens_col: str = "n_chunk_tokens",
    budget: int = 512,
    num_shards: int = 16,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Assign (shard, bin, position) to every chunk row.

    position is the chunk's index within its bin; (shard, bin) is the
    training-sequence identity. Deterministic AND engine-portable (the
    sampling-module contract): shard and order derive from md5 of the
    chunk identity — a DuckDB/pandas re-run packs identically, which is
    what lets the oracle replay the layout and an auditor reproduce any
    training sequence from the raw corpus.
    """
    ident = [F.col(c).cast("string") for c in id_cols]
    key = F.concat_ws(":", *ident)
    shard = F.pmod(
        F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("long"),
        F.lit(num_shards),
    )
    order = F.md5(F.concat(F.lit("pack-order:"), key))
    out = chunks.withColumn("shard", shard).withColumn("__ord", order)
    w = (
        Window.partitionBy("shard")
        .orderBy("__ord", *id_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        out.withColumn("bin", F.floor(prefix / budget))
        .withColumn(
            "position",
            F.row_number().over(
                Window.partitionBy("shard", "bin").orderBy("__ord", *id_cols)
            )
            - 1,
        )
        .drop("__ord")
    )


def packed_sequences(
    chunks: DataFrame,
    tokens_col: str = "n_chunk_tokens",
    budget: int = 512,
    num_shards: int = 16,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
) -> DataFrame:
    """Per-sequence summary: (shard, bin, n_chunks, seq_tokens)."""
    packed = pack_chunks(chunks, tokens_col, budget, num_shards, id_cols)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(tokens_col).alias("seq_tokens"),
    )


# the length-bucketed layout's identity expressions, shared by the
# batcher and the padding report's bucket-collapsed baseline replay: if
# salt, key derivation, or batch formula ever changed in only one of the
# two, the baseline would silently replay a DIFFERENT layout and the
# report's isolated-effect claim (same shards, same order, only the
# bucket differs) would be wrong with no test failing.
def _lenbatch_key(id_cols: tuple[str, ...]):
    return F.concat_ws(":", *[F.col(c).cast("string") for c in id_cols])


def _lenbatch_shard(id_cols: tuple[str, ...], num_shards: int):
    return F.pmod(
        F.conv(F.substring(F.md5(_lenbatch_key(id_cols)), 1, 6), 16, 10).cast(
            "long"
        ),
        F.lit(num_shards),
    )


def _lenbatch_order(id_cols: tuple[str, ...]):
    return F.md5(F.concat(F.lit("lenbatch-order:"), _lenbatch_key(id_cols)))


def _batch_of(rn, batch_size: int):
    return F.floor((rn - F.lit(1)) / batch_size)


def length_bucketed_batches(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    batch_size: int = 8,
    num_shards: int = 8,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Length-bucketed training batches: items with similar lengths
    batch together, so per-batch padding to the batch max wastes far
    fewer slots than global batching (the dynamic-batching standard in
    seq2seq training). Buckets are floor(log2(tokens)) — geometric
    widths hold relative overhead roughly constant across scales.

    Batch identity is deterministic and engine-portable (the pack_chunks
    contract): md5-derived shard within bucket, md5 order within shard,
    batch = floor(rank / batch_size). The only non-map operation is the
    per-(bucket, shard) row_number — one shard of one bucket per task,
    bounded by num_shards exactly as in pack_chunks, never a global or
    per-bucket single-task sort.

    Returns the input rows + (len_bucket, shard, batch) columns.
    """
    out = (
        df.filter(F.col(tokens_col) > 0)
        .withColumn("len_bucket", F.floor(F.log2(F.col(tokens_col))))
        .withColumn("shard", _lenbatch_shard(id_cols, num_shards))
        .withColumn("__ord", _lenbatch_order(id_cols))
    )
    rn = F.row_number().over(
        Window.partitionBy("len_bucket", "shard").orderBy("__ord", *id_cols)
    )
    return out.withColumn("batch", _batch_of(rn, batch_size)).drop("__ord")


def padding_waste_report(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    batch_size: int = 8,
    num_shards: int = 8,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Quantify what length-bucketing buys: per bucket, the padded-slot
    waste of batching items to the per-batch max length, PLUS a
    bucket = -1 baseline row replaying the identical sharded batching
    WITHOUT the length bucket (what a naive loader pays). Waste =
    sum_batches(batch_max * batch_rows - batch_tokens) /
    sum_batches(batch_max * batch_rows), rounded to 4 decimals — all
    integer arithmetic until the final ratio, so the oracle replays it
    exactly. Returns (len_bucket, n_items, n_batches, pad_waste_rate).
    """

    def _report(batched: DataFrame, bucket_keys: list) -> DataFrame:
        per_batch = batched.groupBy(*bucket_keys, "shard", "batch").agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(tokens_col).alias("__tok"),
            F.max(tokens_col).alias("__max"),
        )
        return per_batch.groupBy(*bucket_keys).agg(
            F.sum("__n").cast("long").alias("n_items"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.round(
                1
                - F.sum("__tok") / F.sum(F.col("__max") * F.col("__n")),
                4,
            ).alias("pad_waste_rate"),
        )

    bucketed = length_bucketed_batches(
        df, tokens_col, batch_size, num_shards, id_cols
    )
    flat = bucketed.withColumn("len_bucket", F.lit(-1).cast("bigint"))
    # the baseline replays the same (shard, rank) layout with the bucket
    # dimension collapsed: same shards, same md5 order (the shared
    # _lenbatch_* expressions above), so the ONLY difference measured is
    # the length grouping itself.
    rn = F.row_number().over(
        Window.partitionBy("shard").orderBy(_lenbatch_order(id_cols), *id_cols)
    )
    flat = flat.withColumn("batch", _batch_of(rn, batch_size))
    return _report(bucketed, ["len_bucket"]).unionByName(
        _report(flat, ["len_bucket"])
    )

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

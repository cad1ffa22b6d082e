"""File-compaction planning: bin-pack small files into target-sized
output groups (the small-files problem — the #1 operational cost of a
100-TB parquet lake: a 100k-file partition reads 100k footers and
schedules 100k splits; compaction into ~target-byte files is what
Delta ``OPTIMIZE`` / Iceberg ``rewrite_data_files`` do).

Strategy: within each group (e.g. a hive partition), files are taken in
a deterministic order and assigned to bins by cumulative size:

    bin = floor((cumsum(size) - size) / target_bytes)

i.e. a new bin starts once the running total crosses the target — the
sequential first-fit that per-partition compactors run, expressed as a
prefix sum so the PLAN (not just the rewrite) is a distributed query.
Every bin except possibly the last holds >= target_bytes only if a
single file exceeds the target; bins are within one file of the target
otherwise — the same guarantee OPTIMIZE gives.

Scale shape: a per-group ordered cumulative sum is the low-cardinality
window straggler (one task sorts an entire hive partition's listing) —
the same hazard ``operators.windows.ntile_ranged`` documents. Same
remedy: range-partition on (group, order) so each task holds a
contiguous slice, aggregate per-slice byte totals (tiny: #slices ×
#groups rows), turn them into cumulative byte offsets on the driver,
and broadcast back — global cumsum = slice-local cumsum + offset.
Listings are metadata (#files rows, not data bytes), so the collect is
bounded by #slices × #groups regardless of corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    size_col: str,
    target_bytes: int,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    bin_col: str = "bin",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every file a compaction ``bin_col`` within its group.

    ``order_cols`` must make the within-group order total (include a
    unique key) — determinism of the plan depends on it.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    keys = list(group_cols)
    order = list(order_cols)
    spark = files.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 2
    parted = (
        files.repartitionByRange(n, *[F.col(c) for c in keys + order])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin RangePartitioner boundaries
    )
    slice_sums = (
        parted.groupBy("__pid", *keys)
        .agg(F.sum(size_col).alias("__bytes"))
        .collect()
    )
    acc: dict[tuple, int] = {}
    offsets = []
    for r in sorted(slice_sums, key=lambda r: r["__pid"]):
        k = tuple(r[c] for c in keys)
        offsets.append((r["__pid"], *k, acc.get(k, 0)))
        acc[k] = acc.get(k, 0) + r["__bytes"]
    key_schema = ", ".join(f"{c} {dict(files.dtypes)[c]}" for c in keys)
    offsets_df = spark.createDataFrame(
        offsets, f"__pid INT, {key_schema}, __off BIGINT"
    )
    w = (
        Window.partitionBy("__pid", *keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w) + F.col("__off")
    return (
        parted.join(F.broadcast(offsets_df), ["__pid", *keys])
        .withColumn(
            bin_col,
            F.floor((cum - F.col(size_col)) / F.lit(float(target_bytes))).cast("int"),
        )
        .drop("__pid", "__off")
    )


def compaction_summary(
    plan: DataFrame,
    size_col: str,
    group_cols: Sequence[str],
    bin_col: str = "bin",
) -> DataFrame:
    """Per-bin rollup of a compaction plan: ``(group..., bin, n_files,
    bin_bytes)`` — what an operator reviews before launching the
    rewrite. One partial-aggregated shuffle on (group, bin)."""
    return plan.groupBy(*group_cols, bin_col).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(size_col).alias("bin_bytes"),
    )

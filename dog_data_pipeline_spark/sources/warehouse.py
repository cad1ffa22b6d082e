"""Bucketed / partitioned storage layouts (the §4 scale story's
co-location tools).

- ``write_bucketed`` / ``bucketed_join``: pre-shuffle a fact table ONCE
  into N hash buckets on the join key; every later join or aggregation
  on that key reads co-located buckets and plans NO Exchange. At 100 TB
  this converts the recurring join shuffle (the dominant cost of a
  fact-fact join) into a one-time write cost — the classic
  write-amplification-for-read-locality trade.
- ``write_partitioned``: directory-partitioned parquet; a filter on the
  partition column prunes entire directories at planning time
  (PartitionFilters in the scan, zero I/O for pruned partitions).

Both are thin, opinionated wrappers over the built-in writers — the
value is the enforced layout contract (sorted buckets, explicit
partition columns) plus the plan tests that pin the no-Exchange /
pruning behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets a later sort-merge join skip its sort
    step too (the plan shows SortMergeJoin with no preceding Sort or
    Exchange on this side).
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: bucket metadata makes
    the shuffle unnecessary — the plan is a zero-Exchange (and, with
    sorted buckets, zero-Sort) sort-merge join.

    The merge hint is deliberate: this operator exists for FACT-FACT
    joins where neither side broadcasts. Without it, a small test
    corpus tips the planner into broadcast (which silently DISABLES
    bucketed reads — 'Bucketed: false' in the scan) and the plan shape
    being paid for with the bucketed write never materializes."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), keys, how)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    files_per_partition: int | None = None,
) -> None:
    """Directory-partitioned parquet: one directory per partition value;
    filters on partition columns prune at planning time.

    ``files_per_partition``: when set, cluster rows by (partition cols,
    deterministic salt) before the write so each partition directory
    holds about that many files regardless of upstream task count. An
    unclustered partitionBy emits one file per (task x partition value)
    — the small-files failure measured on the IVF index (81,920 ~320KB
    files for one 32M x 512-cell build; see
    ``operators/similarity.build_ivf_index``). Left ``None`` the input
    partitioning is preserved and the write stays shuffle-free — right
    when upstream already clustered, or the table is small. The salt
    hashes the non-partition atomic columns (deterministic, so a task
    retry re-lands every row in the same shuffle bucket — a
    nondeterministic salt under a partial stage retry can duplicate or
    drop rows)."""
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    if files_per_partition is not None:
        from pyspark.sql import types as T

        def _has_map(dt) -> bool:
            # xxhash64 rejects MapType at ANY nesting depth (maps are
            # unordered, so no stable hash exists) — walk arrays and
            # structs too, not just the top level (advisor r8: an
            # array<map<...>> column passed the old top-level check and
            # failed at plan time)
            if isinstance(dt, T.MapType):
                return True
            if isinstance(dt, T.ArrayType):
                return _has_map(dt.elementType)
            if isinstance(dt, T.StructType):
                return any(_has_map(f.dataType) for f in dt.fields)
            return False

        hashable = [
            f.name
            for f in df.schema.fields
            if f.name not in cols and not _has_map(f.dataType)
        ] or cols
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in hashable]),
            F.lit(max(1, files_per_partition)),
        )
        df = df.repartition(*[F.col(c) for c in cols], salt)
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def zorder_value(x, y, bits: int = 16):
    """Morton (Z-order) code: interleave the low ``bits`` bits of two
    non-negative integer columns — bit i of x lands at position 2i, bit
    i of y at 2i+1.

    WHY: range-partitioning + sorting by z-value co-locates rows that
    are close in BOTH dimensions, so parquet row-group min/max stats
    become tight on BOTH columns at once and a filter on EITHER column
    skips most files (Delta/Iceberg's OPTIMIZE ZORDER is this exact
    move). A single-column sort gives perfect skipping on one column
    and none on the other; the z-curve trades a little of each for a
    lot of both.

    Pure bit arithmetic (shift/and/or) — engine-portable; the registry
    query's oracle recomputes identical codes in SQL.
    """
    from pyspark.sql import functions as F

    z = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xb.bitwiseOR(yb)
        z = term if z is None else z.bitwiseOR(term)
    return z


def zorder_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The same Morton code as ANSI SQL (DuckDB/Trino bit operators) —
    the portability contract used by the oracle."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out along the z-curve of (x_col, y_col):
    range-partition by z-value (one task per output file, balanced by
    sampled range boundaries — no hot partition), sort within
    partitions, drop the helper column.

    Reads filtered on either column then skip files/row-groups via
    parquet min/max stats — no index structure to maintain, the layout
    IS the index.
    """
    from pyspark.sql import functions as F

    z = zorder_value(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )

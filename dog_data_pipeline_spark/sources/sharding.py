"""Deterministic sharded export + manifest — the hand-off format between
a curation pipeline and a training job.

Trainers consume a FIXED set of shard files (data-parallel ranks map to
shards), re-runs must land every document in the same shard (resumable
verification, per-shard caching), and an audit needs per-shard row
counts without re-scanning the corpus. The writer here:

- assigns ``shard = pmod(xxhash64(key), num_shards)`` — a pure function
  of the row key: partition-layout- and run-independent, same contract
  as the sampling module;
- repartitions BY the shard column so each shard is written by one task
  as one file (`partitionBy` then splits the task's output by value —
  directories ``shard=K/part-*.parquet``);
- computes the manifest (rows, docs bytes) per shard in the SAME pass
  shape (one partial-aggregated groupBy on shard — at 100 TB this is
  the only exchange besides the write's own repartition).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` through Spark's Hadoop conf —
    existence probes and renames must go through this API, not
    ``os.path``: the export root is routinely HDFS/S3, where the
    driver's local filesystem sees nothing (an os.path probe silently
    answering False would turn an upsert into a destructive fresh
    write)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _existing_shard_dirs(spark, path: str) -> list[str]:
    """Names of ``shard=K`` children under ``path`` (empty if the root
    doesn't exist), probed through the Hadoop FileSystem API."""
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.getPath().getName().startswith("shard=")
    ]


def with_shard(df: DataFrame, key_col: str, num_shards: int) -> DataFrame:
    """Deterministic shard id: pmod(xxhash64(key), num_shards)."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(num_shards))
    )


def write_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int = 16,
    size_col: str | None = None,
    mode: str = "overwrite",
    use_existing_shard: bool = False,
    split_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` parquet and return the manifest
    DataFrame (shard, n_rows[, total_size]) computed from the data.

    ``size_col``: optional column whose per-shard sum lands in the
    manifest (e.g. n_chars for a documents corpus — the trainer's
    per-rank workload estimate). ``use_existing_shard``: the df already
    carries a ``shard`` column that must be preserved (e.g. the packing
    shard, where a sequence's chunks must land in one file).
    ``split_col``: optional split-assignment column (train/val/test);
    the layout becomes ``split=S/shard=K/`` so a trainer's scan of one
    split prunes the others at planning time, and the manifest reports
    per (split, shard).
    """
    sharded = df if use_existing_shard else with_shard(df, key_col, num_shards)
    part_cols = ([split_col] if split_col else []) + ["shard"]
    (
        sharded.repartition(num_shards, *part_cols)
        .write.mode(mode)
        .partitionBy(*part_cols)
        .parquet(path)
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return sharded.groupBy(*part_cols).agg(*aggs)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard partition (directory-pruned scan)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)


def verify_manifest(spark, path: str, manifest: DataFrame) -> DataFrame:
    """Re-count rows per shard from the written files and diff against
    the manifest: returns shards whose counts disagree (empty = clean).
    The read-back groups on the partition column, so input pruning makes
    this a metadata-light scan."""
    actual = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return (
        manifest.join(actual, "shard", "full")
        .filter(
            F.coalesce(F.col("n_rows"), F.lit(-1))
            != F.coalesce(F.col("actual_rows"), F.lit(-2))
        )
        .select("shard", "n_rows", "actual_rows")
    )


def upsert_sharded(
    spark,
    path: str,
    updates: DataFrame,
    key_col: str,
    num_shards: int = 16,
) -> list[int]:
    """Upsert ``updates`` into a sharded export, rewriting ONLY the
    shards that contain an updated key. Returns the rewritten shard ids.

    Because the shard id is a pure function of the key, an update batch
    touches a bounded, knowable set of shard directories: read back just
    those (partition-pruned), drop the rows whose key is being replaced
    (left-anti join), union the new rows, and rewrite with dynamic
    partition overwrite — untouched shard files are never rewritten.
    At 100 TB this is the difference between an incremental refresh
    costing O(updated shards) and an O(corpus) rewrite. Last-writer-wins
    within a batch is NOT resolved here — feed deduplicated updates (or
    compose with exact_dup_groups upstream).

    Merge mechanics: STAGE-THEN-SWAP. The merged affected shards are
    written to a dot-prefixed staging dir under the export root (hidden
    from Spark readers), then each ``shard=K`` directory is swapped in
    with a filesystem rename. Memory is bounded by a single write task
    regardless of shard size — the earlier ``localCheckpoint`` merge
    materialized every affected shard in the block manager, an
    O(affected-corpus) driver-memory spike when a hot update batch
    touches all shards. Existence is probed through the Hadoop
    FileSystem API, so HDFS/S3 exports upsert instead of being silently
    clobbered (an os.path probe answers False off-driver).
    """
    upd = with_shard(updates, key_col, num_shards)
    affected = sorted(
        r["shard"] for r in upd.select("shard").distinct().collect()
    )
    if not affected:
        return []
    if _existing_shard_dirs(spark, path):
        current = spark.read.parquet(path).filter(F.col("shard").isin(affected))
        keep = current.join(
            F.broadcast(upd.select(key_col).distinct()), key_col, "left_anti"
        )
        merged = keep.unionByName(upd)
        staging = f"{path.rstrip('/')}/.upsert-staging-{uuid.uuid4().hex}"
        (
            merged.repartition(len(affected), "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(staging)
        )
        fs, _ = _hadoop_fs(spark, path)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for k in affected:
            src = jpath(f"{staging}/shard={k}")
            dst = jpath(f"{path.rstrip('/')}/shard={k}")
            if fs.exists(dst):
                fs.delete(dst, True)
            if not fs.rename(src, dst):
                raise IOError(f"shard swap failed: {src} -> {dst}")
        fs.delete(jpath(staging), True)
    else:
        (
            upd.repartition(len(affected), "shard")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard")
            .parquet(path)
        )
    return affected


def shard_paths(path: str, spark=None) -> list[str]:
    """The shard directories present under an export root. Pass
    ``spark`` to probe through the Hadoop FileSystem API (HDFS/S3);
    without it the probe is driver-local (tests, local exports)."""
    if spark is not None:
        return sorted(
            f"{path.rstrip('/')}/{d}" for d in _existing_shard_dirs(spark, path)
        )
    return sorted(
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith("shard=")
    )

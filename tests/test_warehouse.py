"""Plan-pinned tests for the co-location layouts: bucketed joins must
plan NO Exchange (the point of paying the bucketed write), and
partition-column filters must prune at the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dog_data_pipeline_spark.sources.warehouse import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)


def _plan(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("vb")
    )
    write_bucketed(a, "wh_a", "k", num_buckets=8)
    write_bucketed(b, "wh_b", "k", num_buckets=8)
    yield "wh_a", "wh_b"
    spark.sql("DROP TABLE IF EXISTS wh_a")
    spark.sql("DROP TABLE IF EXISTS wh_b")


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    la, lb = bucketed_tables
    joined = bucketed_join(spark, la, lb, "k")
    plan = _plan(spark, joined)
    assert "Exchange" not in plan, plan  # co-located: no shuffle at all
    assert joined.count() == 5_000


def test_bucketed_agg_reuses_bucketing(spark, bucketed_tables):
    la, _ = bucketed_tables
    agg = spark.table(la).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _plan(spark, agg)
    # groupBy on the bucket key needs no shuffle either
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    path = str(tmp_path / "events_parted")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("day")
    )
    write_partitioned(df, path, "day")
    scan = spark.read.parquet(path).filter(F.col("day") == "3")
    plan = _plan(spark, scan)
    assert "PartitionFilters" in plan
    assert "day#" in plan.split("PartitionFilters")[1][:200]
    assert scan.count() == 200


def test_partitioned_write_files_per_partition_bounds_files(spark, tmp_path):
    """files_per_partition clusters by (partition cols, deterministic
    salt) so each partition dir holds ~that many files regardless of
    upstream task count — the small-files fix measured on the IVF index
    (r8). Unclustered, 8 upstream tasks x 5 days would emit up to 40."""
    import glob
    import os

    df = (
        spark.range(0, 1000)
        .repartition(8)
        .select(F.col("id"), (F.col("id") % 5).cast("string").alias("day"))
    )
    path = str(tmp_path / "clustered")
    write_partitioned(df, path, "day", files_per_partition=2)
    for day in range(5):
        n = len(glob.glob(os.path.join(path, f"day={day}", "*.parquet")))
        assert 1 <= n <= 2, (day, n)
    # pruning still works and nothing was lost
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.filter(F.col("day") == "3").count() == 200


def test_partitioned_write_salt_skips_nested_maps(spark, tmp_path):
    """The salt hash must exclude MapType at ANY nesting depth (advisor
    r8): xxhash64 rejects maps — unordered, no stable hash — and an
    array<map<...>> or struct-wrapped map passed the old top-level
    check, failing files_per_partition at plan time. Now such columns
    drop out of the salt (falling back to the partition cols when
    nothing else is hashable) and the write succeeds."""
    import glob
    import os

    df = (
        spark.range(0, 100)
        .repartition(8)
        .select(
            F.col("id"),
            (F.col("id") % 2).cast("string").alias("day"),
            F.array(F.create_map(F.lit("k"), F.col("id"))).alias("am"),
            F.struct(F.create_map(F.lit("k"), F.col("id")).alias("m")).alias("sm"),
        )
    )
    path = str(tmp_path / "nested_maps")
    write_partitioned(df, path, "day", files_per_partition=2)
    got = spark.read.parquet(path)
    assert got.count() == 100
    for day in range(2):
        n = len(glob.glob(os.path.join(path, f"day={day}", "*.parquet")))
        assert 1 <= n <= 2, (day, n)
    # a map-free hashable column (id) still drives the salt: both days
    # hold rows from every upstream task yet land in <= 2 files each
    assert got.filter(F.col("day") == "1").count() == 50

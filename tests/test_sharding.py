"""Sharded-export writer: determinism, balance, manifest integrity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dog_data_pipeline_spark.sources.sharding import (
    read_shard,
    shard_paths,
    verify_manifest,
    with_shard,
    write_sharded,
)
from dog_data_pipeline_spark.tables import load
from tests.conftest import SF_DIR


def test_shard_assignment_is_deterministic_and_partition_invariant(spark):
    docs = load(spark, SF_DIR, "documents")
    a = {r["doc_id"]: r["shard"] for r in with_shard(docs, "doc_id", 8).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in with_shard(docs.repartition(13), "doc_id", 8).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))


def test_write_sharded_one_file_per_shard_and_manifest_matches(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "export")
    manifest = write_sharded(docs, out, "doc_id", num_shards=8, size_col="n_chars")
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == set(range(8))
    # one data file per shard directory (single task per shard)
    for d in shard_paths(out):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d
    # the verification pass agrees with the manifest
    assert verify_manifest(spark, out, manifest).count() == 0
    # total preservation
    assert sum(r["n_rows"] for r in rows.values()) == docs.count()


def test_shards_are_balanced(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    manifest = write_sharded(docs, str(tmp_path / "b"), "doc_id", num_shards=4)
    counts = [r["n_rows"] for r in manifest.collect()]
    assert max(counts) <= 2 * min(counts)  # hash balance at n=500


def test_read_shard_prunes_and_roundtrips(spark, tmp_path):
    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "rt")
    write_sharded(docs, out, "doc_id", num_shards=4)
    one = read_shard(spark, out, 2)
    ids = {r["doc_id"] for r in one.select("doc_id").collect()}
    expect = {
        r["doc_id"]
        for r in with_shard(docs, "doc_id", 4).filter(F.col("shard") == 2).collect()
    }
    assert ids == expect
    plan = spark._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan  # directory pruning, not a full scan


def test_upsert_rewrites_only_affected_shards(spark, tmp_path):
    from dog_data_pipeline_spark.sources.sharding import upsert_sharded, with_shard

    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "ups")
    write_sharded(docs, out, "doc_id", num_shards=8)
    before = {d: sorted(os.listdir(d)) for d in shard_paths(out)}

    updates = spark.createDataFrame(
        [(5, "updated text five", "en", "srcX", 17),
         (10**6, "brand new doc", "en", "srcX", 13)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    touched = upsert_sharded(spark, out, updates, "doc_id", num_shards=8)
    expected_shards = {
        r["shard"] for r in with_shard(updates, "doc_id", 8).collect()
    }
    assert set(touched) == expected_shards

    after = {d: sorted(os.listdir(d)) for d in shard_paths(out)}
    for d in before:
        shard_id = int(d.rsplit("=", 1)[1])
        if shard_id not in expected_shards:
            assert after[d] == before[d], f"untouched shard {d} rewritten"

    final = spark.read.parquet(out)
    assert final.count() == docs.count() + 1  # one replace + one insert
    assert (
        final.filter(F.col("doc_id") == 5).select("text").collect()[0]["text"]
        == "updated text five"
    )
    assert final.filter(F.col("doc_id") == 10**6).count() == 1


def test_upsert_stage_then_swap_cleans_staging_and_is_idempotent(spark, tmp_path):
    from dog_data_pipeline_spark.sources.sharding import upsert_sharded

    docs = load(spark, SF_DIR, "documents")
    out = str(tmp_path / "ups2")
    write_sharded(docs, out, "doc_id", num_shards=4)

    updates = spark.createDataFrame(
        [(5, "v1", "en", "s", 2)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    upsert_sharded(spark, out, updates, "doc_id", num_shards=4)
    # stage-then-swap must leave no staging residue behind
    assert not [d for d in os.listdir(out) if d.startswith(".upsert-staging")]

    # re-upserting the same key replaces, never duplicates (rename swap
    # fully replaced the old shard directory)
    updates2 = spark.createDataFrame(
        [(5, "v2", "en", "s", 2)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    upsert_sharded(spark, out, updates2, "doc_id", num_shards=4)
    final = spark.read.parquet(out)
    assert final.count() == docs.count()
    assert final.filter(F.col("doc_id") == 5).collect()[0]["text"] == "v2"


def test_streaming_upsert_sink_last_batch_wins(spark, tmp_path):
    from dog_data_pipeline_spark.streaming.upsert import upsert_sink

    schema = "doc_id LONG, text STRING, n_chars LONG"
    src = tmp_path / "stream_in"
    src.mkdir()
    spark.createDataFrame(
        [(1, "v1 one", 6), (2, "v1 two", 6)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))
    spark.createDataFrame(
        [(1, "v2 one", 6), (3, "v1 three", 8)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )
    out = str(tmp_path / "target")
    q = upsert_sink(
        stream, out, "doc_id", checkpoint=str(tmp_path / "ckpt"), num_shards=4
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got[2] == "v1 two" and got[3] == "v1 three"
    assert got[1] in ("v1 one", "v2 one")  # whichever file listed later wins
    assert len(got) == 3


def test_split_aware_export_prunes_and_keeps_splits_stable(spark, tmp_path):
    from dog_data_pipeline_spark.operators.sampling import with_split
    from dog_data_pipeline_spark.sources.sharding import write_sharded

    docs = with_split(load(spark, SF_DIR, "documents"), "doc_id")
    out = str(tmp_path / "split_export")
    manifest = write_sharded(
        docs, out, "doc_id", num_shards=4, split_col="split"
    )
    rows = manifest.collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert sum(r["n_rows"] for r in rows) == docs.count()
    # layout: split=S/shard=K directories
    assert os.path.isdir(os.path.join(out, "split=train", "shard=0"))
    # a train-only scan prunes the other splits at planning time
    train = spark.read.parquet(out).filter(F.col("split") == "train")
    plan = spark._jvm.PythonSQLUtils.explainString(
        train._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    # split assignment matches the sampling module's stable hash
    got_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    expect_train = {
        r["doc_id"] for r in docs.filter(F.col("split") == "train").collect()
    }
    assert got_train == expect_train

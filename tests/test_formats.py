"""ORC/Avro format connector tests: round-trips, partitioned layout,
pushdown reaching the ORC reader, and tabular format conversion."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dog_data_pipeline_spark.sources import (
    AvroUnavailableError,
    avro_available,
    convert_table,
    read_avro,
    read_orc,
    write_avro,
    write_orc,
)
from dog_data_pipeline_spark.tables import load


def test_orc_roundtrip_preserves_values_and_schema(spark, tmp_path):
    nation = load(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert back.schema == nation.schema
    a = sorted(nation.collect())
    b = sorted(back.collect())
    assert a == b


def test_orc_partitioned_write_prunes_partitions(spark, tmp_path):
    orders = load(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path, partition_by=["status"])
    # hive-style partition dirs exist
    assert any(d.startswith("status=") for d in os.listdir(path))
    back = read_orc(spark, path).filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must not appear as a data Filter over all rows:
    # the scan's partition pruning handles it
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    assert "PartitionFilters: [isnotnull(status" in plan or "status=F" in plan


def test_orc_scan_pushes_down_predicates(spark, tmp_path):
    lineitem = load(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "lineitem_orc")
    write_orc(lineitem.select("l_orderkey", "l_quantity", "l_returnflag"), path)
    q = read_orc(spark, path).filter(F.col("l_quantity") > 45).select("l_orderkey")
    plan = q._jdf.queryExecution().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]
    # column pruning: the read schema should not include l_returnflag
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema


def test_convert_table_parquet_to_orc_to_csv(spark, tmp_path):
    src = "/root/testdata/sf0.001/region.parquet"
    orc_path = str(tmp_path / "region_orc")
    csv_path = str(tmp_path / "region_csv")
    convert_table(spark, src, "parquet", orc_path, "orc")
    convert_table(spark, orc_path, "orc", csv_path, "csv")
    back = spark.read.option("header", True).csv(csv_path)
    assert back.count() == 5
    assert set(back.columns) == {"r_regionkey", "r_name"}


def test_convert_table_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        convert_table(spark, "/x", "parquet", "/y", "feather")


def test_avro_roundtrip_or_clear_error(spark, tmp_path):
    """Avro's short name is not service-registered in every distribution;
    the helpers resolve the bundled connector class when present, and
    otherwise fail with the actionable AvroUnavailableError — never a raw
    ClassNotFoundException."""
    nation = load(spark, "/root/testdata/sf0.001", "nation")
    path = str(tmp_path / "nation_avro")
    if avro_available(spark):
        write_avro(nation, path)
        back = read_avro(spark, path)
        assert sorted(back.collect()) == sorted(nation.collect())
        assert back.schema == nation.schema
    else:
        with pytest.raises(AvroUnavailableError):
            write_avro(nation, path)
        with pytest.raises(AvroUnavailableError):
            read_avro(spark, path)


def test_avro_partitioned_and_convert_roundtrip(spark, tmp_path):
    if not avro_available(spark):
        pytest.skip("spark-avro not on classpath")
    orders = load(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_avro")
    write_avro(orders, path, partition_by=["o_orderstatus"])
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(path))
    back = read_avro(spark, path)
    assert back.count() == orders.count()
    # avro -> parquet conversion through the generic converter
    pq = str(tmp_path / "orders_pq")
    convert_table(spark, path, "avro", pq, "parquet")
    assert spark.read.parquet(pq).count() == orders.count()


def test_jsonl_roundtrip_and_line_format(spark, tmp_path):
    import glob
    import gzip
    import json

    from dog_data_pipeline_spark.sources.formats import read_jsonl, write_jsonl
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").limit(20)
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark, out, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b
    # the files really are one-JSON-object-per-line, gzipped
    files = glob.glob(out + "/part-*.json.gz")
    assert files
    with gzip.open(files[0], "rt") as f:
        first = f.readline()
    assert json.loads(first)["doc_id"] in a

"""Storage-layout tests (SURVEY §4.2 / pyspark guide 'Partitioning &
shuffle'): bucketing co-locates joins (no exchange), partitionBy layout
prunes at the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    df.collect()  # finalize AQE
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # stale dirs from
        # prior sessions: the in-memory catalog forgot them but the
        # managed location persists
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
    )
    (
        o.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
    )
    return spark


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable auto-broadcast so the big-x-big co-located path is planned
    # (at real scale neither side broadcasts; locally they would)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("ord_bucketed")
        joined = li.join(o, "l_orderkey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(joined)
        # co-located bucketed join: the join needs NO exchange on the
        # bucket key — only the final aggregation shuffles
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, (
            "bucketed join must not re-shuffle on the bucket key"
        )
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_write_prunes_at_scan(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(d)
    back = spark.read.parquet(d).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].split("\n")[0]
    n_f = o.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f

"""Golden-output unit tests for the operator library on tiny literal
DataFrames (SURVEY §5.2), including the reference's edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators import (
    anti_join,
    completeness_filter,
    conditional_frequency_filter,
    dense_ids,
    drop_incomplete_windows,
    ordered_collect,
    partition_max,
    recode_with_fallthrough,
    split_status,
    tumbling_bucket,
    zip_explode,
)


def test_recode_fallthrough_passes_unmapped(spark):
    # pandas .replace semantics (preprocess_dataset.py:113): 71/74 unmapped
    df = spark.createDataFrame([(71,), (72,), (74,)], "label INT")
    out = recode_with_fallthrough(df, "label", {72: 99}, out="r")
    got = {r["label"]: r["r"] for r in out.collect()}
    assert got == {71: 71, 72: 99, 74: 74}


def test_ordered_collect_is_deterministic(spark):
    rows = [("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "q")]
    df = spark.createDataFrame(rows, "k STRING, ord INT, v STRING").repartition(4)
    out = {r["k"]: r["seq"] for r in ordered_collect(df, ["k"], "ord", "v").collect()}
    assert out == {"a": ["x", "y", "z"], "b": ["q"]}


def test_ordered_collect_multi_key_breaks_ties(spark):
    rows = [("a", 1, "z"), ("a", 1, "x"), ("a", 1, "y")]
    df = spark.createDataFrame(rows, "k STRING, ord INT, v STRING").repartition(3)
    out = {r["k"]: r["seq"] for r in ordered_collect(df, ["k"], ["ord", "v"], "v").collect()}
    assert out == {"a": ["x", "y", "z"]}


def test_conditional_frequency_filter(spark):
    # dog-frequency > 0.3 semantics (raw_to_samples.py:147-153): strict >
    rows = [(1, "dog"), (1, "dog"), (1, "cat"), (2, "dog"), (2, "cat"), (2, "cat"), (2, "cat")]
    df = spark.createDataFrame(rows, "sub INT, cls STRING")
    out = conditional_frequency_filter(df, ["sub"], F.col("cls") == "dog", 0.3)
    assert [r["sub"] for r in out.collect()] == [1]  # 2/3 > 0.3; 1/4 < 0.3


def test_completeness_filter(spark):
    # subject present in EVERY frame (raw_to_samples.py:211-216)
    rows = [(1, 0), (1, 1), (1, 2), (2, 0), (2, 2)]
    df = spark.createDataFrame(rows, "sub INT, frame INT")
    out = completeness_filter(df, ["sub"], 3)
    assert [r["sub"] for r in out.collect()] == [1]


def test_partition_max(spark):
    rows = [(1, 5.0), (1, 9.0), (2, 3.0)]
    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    out = partition_max(df, ["k"], {"mx": F.col("v")})
    got = {(r["k"], r["v"]): r["mx"] for r in out.collect()}
    assert got == {(1, 5.0): 9.0, (1, 9.0): 9.0, (2, 3.0): 3.0}


def test_tumbling_and_incomplete_drop(spark):
    rows = [(0,), (1,), (3,), (4,), (5,), (10,)]
    df = spark.createDataFrame(rows, "sec INT").withColumn(
        "ts", F.timestamp_seconds(F.col("sec"))
    )
    seg = tumbling_bucket(df, "ts", 3, out="w")
    wins = sorted({r["w"] for r in seg.collect()})
    assert wins == [0, 3, 9]
    kept = drop_incomplete_windows(seg, ["w"], 2)
    assert sorted({r["w"] for r in kept.collect()}) == [0, 3]


def test_zip_explode_alignment(spark):
    df = spark.createDataFrame([(1, [10, 20], ["a", "b"])], "k INT, xs ARRAY<INT>, ys ARRAY<STRING>")
    out = zip_explode(df, ["k"], ["xs", "ys"]).collect()
    assert [(r["pos"], r["xs"], r["ys"]) for r in out] == [(0, 10, "a"), (1, 20, "b")]


def test_anti_join(spark):
    src = spark.createDataFrame([("a",), ("b",), ("c",)], "name STRING")
    done = spark.createDataFrame([("b",), ("b",)], "name STRING")
    out = sorted(r["name"] for r in anti_join(src, done, "name").collect())
    assert out == ["a", "c"]


def test_split_status_routes_nulls_to_dead_letter(spark):
    rows = [(1, 5.0), (2, None), (3, -1.0)]
    df = spark.createDataFrame(rows, "id INT, v DOUBLE")
    ok, err = split_status(df, F.col("v") >= 0, F.lit("bad"))
    assert sorted(r["id"] for r in ok.collect()) == [1]
    assert sorted(r["id"] for r in err.collect()) == [2, 3]


def _check_dense(df, out_rows):
    got = sorted((r["k"], r["id"]) for r in out_rows)
    assert got == [(10, 0), (20, 1), (30, 2), (40, 3)]


def test_dense_ids_small_path(spark):
    df = spark.createDataFrame([(30,), (10,), (40,), (20,)], "k INT").repartition(3)
    _check_dense(df, dense_ids(df, "k", out="id").collect())


def test_dense_ids_partitioned_path(spark):
    df = spark.createDataFrame([(30,), (10,), (40,), (20,)], "k INT").repartition(3)
    out = dense_ids(df, "k", out="id", small_threshold=0, num_partitions=3)
    _check_dense(df, out.collect())


def test_dense_ids_offset(spark):
    df = spark.createDataFrame([(2,), (1,)], "k INT")
    got = sorted((r["k"], r["id"]) for r in dense_ids(df, "k", offset=100).collect())
    assert got == [(1, 100), (2, 101)]


def test_ntile_ranged_matches_builtin_ntile(spark):
    import random

    from pyspark.sql import Window
    from dog_data_pipeline_spark.operators.windows import ntile_ranged

    rng = random.Random(7)
    rows = [
        (f"k{rng.randrange(3)}", rng.randrange(50), i) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "key STRING, v INT, id INT")
    got = {
        (r["key"], r["id"]): r["b"]
        for r in ntile_ranged(
            df, 4, ["key"], ["v", "id"], out="b", num_partitions=5
        ).collect()
    }
    w = Window.partitionBy("key").orderBy("v", "id")
    want = {
        (r["key"], r["id"]): r["b"]
        for r in df.withColumn("b", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_ntile_ranged_uneven_buckets(spark):
    # 10 rows, 4 buckets -> sizes 3,3,2,2 (first n%k buckets get the extra)
    from dog_data_pipeline_spark.operators.windows import ntile_ranged

    df = spark.createDataFrame([("a", i) for i in range(10)], "key STRING, id INT")
    out = ntile_ranged(df, 4, ["key"], ["id"], out="b", num_partitions=3)
    sizes = {
        r["b"]: r["n"]
        for r in out.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}

"""Window / partition-analytic / tumbling-window operators (SURVEY §2.5, §2.9)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partition_max(
    df: DataFrame, keys: Sequence[str], measures: dict[str, Column]
) -> DataFrame:
    """Attach per-partition max of derived measures to every row (SURVEY W1).

    Generalizes the resize-every-bbox-to-its-subject's-max transform at
    ``src/raw_to_samples.py:59-90``. A single Window physical operator
    (one shuffle on `keys`) replaces the reference's build-dict-then-probe
    two-pass; no join needed.
    """
    w = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = df
    for name, expr in measures.items():
        out = out.withColumn(name, F.max(expr).over(w))
    return out


def tumbling_bucket(
    df: DataFrame,
    ts: str,
    duration_sec: int,
    out: str = "win_start",
) -> DataFrame:
    """Tumbling-window bucketing on an event-time axis (SURVEY T1).

    Generalizes the 2-second frame segmentation at
    ``src/raw_to_samples.py:16,330-336`` to real timestamps: the window
    start epoch = floor(epoch(ts)/duration)*duration. Pure column
    expression — batch form of ``F.window(ts, f"{d} seconds")`` (the
    streaming variant in ``streaming/`` uses F.window + watermark).
    """
    win = (F.floor(F.unix_timestamp(F.col(ts)) / duration_sec) * duration_sec).cast(
        "bigint"
    )
    return df.withColumn(out, win)


def drop_incomplete_windows(
    df: DataFrame,
    window_keys: Sequence[str],
    expected: Column | int,
) -> DataFrame:
    """Drop windows with fewer than `expected` rows (SURVEY T2).

    Generalizes the trailing-partial-segment drop at
    ``src/raw_to_samples.py:339-341``. Implemented as a window-count
    attached per row + filter, so surviving rows keep full detail.
    """
    exp = F.lit(expected) if isinstance(expected, int) else expected
    w = Window.partitionBy(*window_keys)
    return (
        df.withColumn("__wn", F.count(F.lit(1)).over(w))
        .filter(F.col("__wn") >= exp)
        .drop("__wn")
    )


def ntile_ranged(
    df: DataFrame,
    n_buckets: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ntile WITHOUT a per-key single-task sort (§2.5 scale path).

    ``ntile(k).over(Window.partitionBy(key).orderBy(...))`` sorts each
    key's ENTIRE partition in one task — with a handful of low-cardinality
    keys that is a straggler/OOM shape at 100 TB. Here:

    1. range-partition on (partition_by ++ order_by) — a parallel global
       sort in which each key occupies a contiguous run of partitions;
    2. row_number within (range-partition, key) — each task sorts only
       its own slice;
    3. collect per-(range-partition, key) counts — tiny: #partitions ×
       #keys rows — and turn them into cumulative offsets and per-key
       totals on the driver;
    4. broadcast the offsets back: global rank = local rank + offset,
       then the exact ntile formula (first n%k buckets get one extra
       row) assigns the bucket.

    The partitioned input is localCheckpoint-ed so the counts job and the
    final job see identical RangePartitioner boundaries (same fix as
    ``dense_ids``). Output matches ``F.ntile(k)`` exactly when the order
    is total (callers must include a tie-break column).
    """
    keys = list(partition_by)
    order_cols = list(order_by)
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 2
    parted = (
        df.repartitionByRange(n, *[F.col(c) for c in keys + order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = (
        parted.groupBy("__pid", *keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    totals: dict[tuple, int] = {}
    for r in sorted(counts, key=lambda r: r["__pid"]):
        k = tuple(r[c] for c in keys)
        totals[k] = totals.get(k, 0) + r["cnt"]
    offsets = []
    acc: dict[tuple, int] = {}
    for r in sorted(counts, key=lambda r: r["__pid"]):
        k = tuple(r[c] for c in keys)
        offsets.append((r["__pid"], *k, acc.get(k, 0), totals[k]))
        acc[k] = acc.get(k, 0) + r["cnt"]
    key_schema = ", ".join(
        f"{c} {dict(df.dtypes)[c]}" for c in keys
    )
    offsets_df = spark.createDataFrame(
        offsets, f"__pid INT, {key_schema}, __off BIGINT, __n BIGINT"
    )
    w = Window.partitionBy("__pid", *keys).orderBy(*order_cols)
    ranked = (
        parted.join(F.broadcast(offsets_df), ["__pid", *keys])
        .withColumn("__rank", F.row_number().over(w) + F.col("__off"))
    )
    # exact ntile: q = n div k, rem = n mod k; first rem buckets hold q+1
    k_ = F.lit(n_buckets)
    q = F.floor(F.col("__n") / k_).cast("bigint")
    rem = F.col("__n") % k_
    big = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = F.when(
        F.col("__rank") <= big, F.ceil(F.col("__rank") / (q + 1))
    ).otherwise(rem + F.ceil((F.col("__rank") - big) / F.greatest(q, F.lit(1))))
    return ranked.withColumn(out, bucket.cast("int")).drop(
        "__pid", "__off", "__n", "__rank"
    )


def gap_fill_daily(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    out: str = "n_events",
) -> DataFrame:
    """Dense per-key daily calendar with zero-filled gaps — the
    resample/gap-fill step before any time-series model sees the data
    (a missing day must read as 0, not as an absent row).

    Shape: one partial-aggregated (key, day) count, a tiny per-key span
    aggregate, then sequence()-explode of each key's [min_day, max_day]
    span joined back to the counts. The calendar explode fans out to
    span-length rows per key — bounded by the observation window, never
    by the event volume — and joins on (key, day) where the dense side
    is generated, not shuffled from facts.
    """
    keys = [F.col(c) for c in key_cols]
    day = F.date_trunc("day", F.col(ts_col))
    daily = df.groupBy(*keys, day.alias("day")).agg(
        F.count(F.lit(1)).alias(out)
    )
    spans = daily.groupBy(*key_cols).agg(
        F.min("day").alias("__mn"), F.max("day").alias("__mx")
    )
    cal = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    return cal.join(daily, [*key_cols, "day"], "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(0))
    )

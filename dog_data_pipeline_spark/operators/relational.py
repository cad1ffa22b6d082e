"""Relational operators: recodes, anti-joins, scalar joins, zip joins,
scalable dense IDs.

Capability parity (SURVEY.md §2.2/§2.3/§2.5; reference citations in each
docstring point into /root/reference/ for the behavior being generalized).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recode_with_fallthrough(
    df: DataFrame,
    col: str,
    mapping: Mapping[object, object],
    out: str | None = None,
) -> DataFrame:
    """Value recode with pass-through for unmapped keys (SURVEY P5).

    Mirrors pandas ``Series.replace`` semantics the reference relies on at
    ``src/preprocess_dataset.py:103-113``: keys absent from the mapping
    (e.g. labels 71/74 there) pass through UNCHANGED. Compiles to a chained
    CASE WHEN — pure Catalyst expression, codegen-friendly, no shuffle.
    """
    out = out or col
    expr: Column = F.col(col)
    result = None
    for k, v in mapping.items():
        cond = F.col(col) == F.lit(k)
        result = F.when(cond, F.lit(v)) if result is None else result.when(cond, F.lit(v))
    expr = expr if result is None else result.otherwise(F.col(col))
    return df.withColumn(out, expr)


def recode_with_mapping_table(
    df: DataFrame,
    mapping_df: DataFrame,
    key: str,
    value_col: str,
    out: str,
) -> DataFrame:
    """Recode via broadcast dimension join with coalesce fallback (SURVEY J2/P5).

    The scale path for large mappings: `mapping_df(key, value_col)` is
    broadcast (map-side hash lookup, no shuffle of `df`); unmatched keys
    fall through to the original value — same semantics as
    ``recode_with_fallthrough`` but the mapping lives in a table.
    """
    m = mapping_df.select(F.col(key).alias("__k"), F.col(value_col).alias("__v"))
    joined = df.join(F.broadcast(m), df[key] == F.col("__k"), "left")
    return joined.withColumn(out, F.coalesce(F.col("__v"), F.col(key))).drop("__k", "__v")


def anti_join(src: DataFrame, done: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Idempotent-skip anti-join (SURVEY J5/S12).

    Generalizes the skip-if-already-converted check at
    ``src/preprocess_dataset.py:54-56``: keep source rows whose key does
    not appear in `done`. Spark plans a broadcast anti-join when `done`
    is small; at scale AQE may pick shuffled hash anti-join.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return src.join(done.select(*keys).dropDuplicates(keys), keys, "left_anti")


def with_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """Scalar-subquery join (SURVEY J6).

    Generalizes the max-catalog-index seed at
    ``src/preprocessed_to_raw.py:26-29``: attach a 1-row aggregate to every
    row. Implemented as a broadcast cross join — the 1-row side is
    broadcast, so this is shuffle-free on `df`.
    """
    return df.crossJoin(F.broadcast(scalar_df))


def zip_explode(
    df: DataFrame,
    keys: Sequence[str],
    array_cols: Sequence[str],
    pos_col: str = "pos",
) -> DataFrame:
    """Positional zip join of parallel arrays (SURVEY J3).

    Generalizes ``zip(all_ids[i], all_items[i])`` at
    ``src/raw_to_samples.py:156-164``: align N parallel array columns by
    position and explode to one row per position. `arrays_zip` +
    `posexplode` — no shuffle, no UDF.
    """
    zipped = F.posexplode(F.arrays_zip(*[F.col(c) for c in array_cols]))
    exploded = df.select(*keys, zipped.alias(pos_col, "__z"))
    return exploded.select(
        *keys, pos_col, *[F.col(f"__z.{c}").alias(c) for c in array_cols]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join by key salting.

    When one join key dominates (a hot video, a viral document), the
    task owning that key becomes the straggler. Salting splits each hot
    key across `salt` tasks: the skewed side gets a random salt in
    [0, salt); the other side is replicated `salt` times (explode), and
    the join runs on (key..., salt). AQE's skew-join handles moderate
    skew automatically; this is the explicit tool for extreme key skew
    or for engines/paths where AQE can't split (e.g. bucketed tables).

    Replication multiplies the other side by `salt` — use with a small
    or pre-filtered right side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    left = skewed.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left.join(right, [*keys, "__salt"], how).drop("__salt")


def dense_ids(
    df: DataFrame,
    order_by: str,
    out: str = "id",
    offset: int = 0,
    num_partitions: int | None = None,
    small_threshold: int = 10_000_000,
) -> DataFrame:
    """Dense sequential IDs WITHOUT a single-partition global window (SURVEY W2).

    Generalizes the max+1 catalog numbering at
    ``src/preprocessed_to_raw.py:37-46``. A naive
    ``row_number().over(Window.orderBy(...))`` collapses to ONE partition —
    a 100-TB deal-breaker. Adaptive strategy:

    - input ≤ `small_threshold` rows (one cheap count): the global window
      is a bounded single-task sort — take it, it avoids two extra jobs;
    - larger inputs: the zipWithIndex pattern, DataFrame-native —
      (1) range-partition by the order key (parallel global sort),
      (2) count rows per range partition (tiny: #partitions rows to the
          driver),
      (3) row_number within each partition + that partition's cumulative
          offset.
      Every step is fully parallel; driver-side data is one count per
      partition. The partitioned input is localCheckpoint-ed (lazily —
      the counts job materializes it) so the count job and the final job
      see the SAME partition boundaries: RangePartitioner samples with a
      nondeterministic seed, so re-executing the repartitionByRange as
      two independent actions could place rows differently and make the
      collected per-partition offsets stale (duplicate/skipped IDs).
    """
    total = df.count()
    if total <= small_threshold:
        w = Window.orderBy(order_by)
        return df.withColumn(
            out, (F.row_number().over(w) - 1 + offset).cast("bigint")
        )

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 4
    parted = (
        df.repartitionByRange(n, F.col(order_by))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()], "__pid INT, __off BIGINT"
    )
    w = Window.partitionBy("__pid").orderBy(order_by)
    return (
        parted.join(F.broadcast(offsets_df), "__pid")
        .withColumn(out, (F.row_number().over(w) - 1 + F.col("__off")).cast("bigint"))
        .drop("__pid", "__off")
    )

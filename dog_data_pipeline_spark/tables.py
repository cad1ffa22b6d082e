"""Schema-declared loaders for the driver's test tables (TESTDATA.md).

Schemas are declared explicitly (never inferred) so scans prune columns
and push filters; see FIXTURES.md §A for the verified parquet footers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Parquet carries its own schema; Catalyst
    prunes columns / pushes predicates into the scan automatically.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects by default; we read it as long (legacy conf) and
    normalize to a proper TimestampType column (micros precision — the
    sub-microsecond part is irrelevant to every windowing op here, and
    DuckDB oracles compare on epoch-second arithmetic).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Defensive: oracle SQL compares epoch/date arithmetic; pin UTC even
    # when the caller's session (e.g. the driver's) didn't.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType whatever the parquet
    physical type was: TIMESTAMP(NANOS) surfaces as long under the
    legacy nanosAsLong conf (round-1 driver data), TIMESTAMP(MICROS)
    without tz surfaces as TIMESTAMP_NTZ (round-2 driver data). With
    the session TZ pinned UTC the NTZ->timestamp cast is the identity
    on wall-clock values, so epoch arithmetic matches DuckDB either
    way."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the SQL API surface."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

"""Columnar/row format connectors beyond parquet+CSV: ORC and Avro.

The reference's storage surface is CSV + JSON + media files; an engine
meant to replace it on a warehouse needs the other mainstream formats
too. ORC ships in Spark's core distribution (orc-core jars), supports
the same predicate pushdown / column pruning as parquet, and is the
format most Hive-era warehouses still hold. Avro is the row-oriented
interchange format Kafka pipelines emit; the ``spark-avro`` DataSource
is an EXTERNAL module, so this container may not carry it — the Avro
helpers probe for it and raise :class:`AvroUnavailableError` with a
clear message instead of a cryptic ``ClassNotFoundException``.

Scale notes
-----------
* Reads never ``inferSchema`` — ORC/Avro carry their schema in-file, so
  the footer read is cheap, but callers can pass an explicit schema to
  pin column types across heterogeneous file sets.
* ``read_orc`` keeps pushdown intact: filters land in the ORC reader's
  SearchArgument (``PushedFilters`` in the plan — asserted by
  ``tests/test_sources.py``), so row groups that can't match are never
  decompressed. Same contract as the parquet scans.
* Writes accept ``partition_by`` for partition-pruned layouts, same as
  ``sources/warehouse.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class AvroUnavailableError(RuntimeError):
    """The spark-avro DataSource module is not on the classpath."""


# Some Spark distributions (including this one) bundle the spark-avro
# classes without the META-INF/services registration that maps the
# short name "avro" — `format("avro")` then fails with "Failed to find
# data source" even though the connector is fully functional under its
# class name. Resolve to whichever spelling the classpath supports.
_AVRO_FQCN = "org.apache.spark.sql.avro.AvroFileFormat"


def _avro_format(spark: SparkSession) -> str:
    if not avro_available(spark):
        raise AvroUnavailableError(
            "spark-avro is not on this classpath; add "
            "org.apache.spark:spark-avro_2.13:<spark-version> via "
            "spark.jars.packages to enable Avro I/O"
        )
    return _AVRO_FQCN


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan with pushdown/pruning intact (core Spark, no extra jars)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True iff the external spark-avro DataSource can be resolved."""
    try:
        spark._jvm.java.lang.Class.forName(_AVRO_FQCN)
        return True
    except Exception:
        return False


def read_avro(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(_avro_format(spark)).load(path)


def write_avro(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).format(_avro_format(df.sparkSession))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


_FORMATS = {"parquet", "orc", "csv", "json", "avro"}


def convert_table(
    spark: SparkSession,
    src_path: str,
    src_format: str,
    dst_path: str,
    dst_format: str,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Tabular format conversion (the S13 format-conversion source, for
    tables instead of media): one distributed read → write, no driver
    materialization, so it converts a 100 TB table as happily as a 1 MB
    one. Mirrors ``preprocess_dataset.py``'s convert-on-ingest step in
    the reference, re-expressed as a Spark scan+sink pair."""
    for fmt in (src_format, dst_format):
        if fmt not in _FORMATS:
            raise ValueError(f"unsupported format {fmt!r}; known: {sorted(_FORMATS)}")
    if src_format == "avro":
        src_format = _avro_format(spark)
    if dst_format == "avro":
        dst_format = _avro_format(spark)
    reader = spark.read
    if src_format == "csv":
        # Spark's CSV writer quotes embedded newlines but the reader only
        # reassembles them under multiLine; keep round-trips lossless.
        reader = reader.option("header", True).option("multiLine", True)
    try:
        df = reader.format(src_format).load(src_path)
    except AnalysisException as exc:
        raise ValueError(f"cannot read {src_path} as {src_format}: {exc}") from exc
    writer = df.write.mode("overwrite")
    if dst_format == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(dst_format).save(dst_path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip"
) -> None:
    """JSON-Lines sink — the lingua franca corpus interchange format
    (one JSON object per line; gzip per-file by default, which stays
    splittable across files because parallelism comes from file count).
    Spark's json writer IS jsonl: one object per line, newline-delimited.
    """
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSONL scan. Pass an explicit DDL ``schema`` in production —
    schema inference is a full extra pass over the data, the classic
    accidental 2x read at corpus scale."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)

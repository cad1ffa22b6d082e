"""Catalog CSV source/sink (SURVEY S1-S3) with transactional overwrite.

The reference reads ``labels.csv``, mutates it in pandas, and overwrites
it in place (``preprocessed_to_raw.py:26-52``) — a read-modify-write
with no isolation (SURVEY §7.4 flags it). In Spark, overwriting a path
that the current plan is still reading from is actively unsafe (the scan
may re-list mid-write). ``write_catalog_atomic`` stages to a temp dir
and swaps via rename — atomic on a posix filesystem / same-bucket
object-store rename.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CATALOG_SCHEMA = StructType(
    [
        StructField("file_index", LongType()),
        StructField("file_path", StringType()),
        StructField("dataset", StringType()),
        StructField("action", StringType()),
        StructField("original_file_path", StringType()),
    ]
)  # columns per ``preprocessed_to_raw.py:19``


def read_catalog_csv(
    spark: SparkSession, path: str, schema: StructType = CATALOG_SCHEMA
) -> DataFrame:
    """Headered CSV scan with a DECLARED schema (S1) — never inferSchema:
    inference costs an extra full pass and can drift between runs."""
    return spark.read.csv(path, header=True, schema=schema)


def write_catalog_atomic(df: DataFrame, path: str) -> None:
    """Stage-then-swap CSV sink (S3, made safe).

    1. write to ``{path}.__staging_<uuid>``,
    2. materialize fully (the write is the barrier),
    3. atomically swap directories.

    The caller can therefore build the new catalog FROM the old one
    (read → union → write) without corrupting the source mid-plan.
    """
    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").option("header", True).csv(staging)
    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)

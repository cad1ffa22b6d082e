"""Filesystem-as-table source (SURVEY S6/S7 plumbing, P7).

Directory scans become ``binaryFile`` DataFrames: files are rows, path
components are key columns (the reference's naming conventions —
``{idx:06}.mp4``, ``{video}_{seg:03}_{sub:03}.mp4`` — are recovered with
regexp/split projections, never driver-side listing loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_binary_files(
    spark: SparkSession,
    root: str,
    glob: str | None = "*.{mp4,mov}",
    with_content: bool = False,
) -> DataFrame:
    """Recursive file listing as a DataFrame (S6).

    Columns: path, modificationTime, length (+ content BINARY when
    `with_content`). Dropping `content` prunes the payload read at the
    source — listing 100 TB of video costs only metadata I/O.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    if not with_content:
        df = df.drop("content")
    return df


def parse_path_components(
    df: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Attach file_name / extension / parent_dir columns (P6/P7;
    the reference's ``split('/')`` + ``splitext`` derivations at
    ``preprocess_dataset.py:26,44-49``)."""
    parts = F.split(F.col(path_col), "/")
    fname = F.element_at(parts, -1)
    return (
        df.withColumn("file_name", fname)
        .withColumn("extension", F.lower(F.regexp_extract(fname, r"\.([^.]+)$", 1)))
        .withColumn("parent_dir", F.element_at(parts, -2))
        .withColumn("stem", F.substring_index(fname, ".", 1))
    )

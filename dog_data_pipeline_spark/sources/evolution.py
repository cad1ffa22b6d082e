"""Schema evolution over long-lived parquet corpora (SURVEY §2.1
extension): a 100 TB corpus is written over months by evolving
pipelines, so files carry DIFFERENT schemas — later generations add
columns. Reading such a corpus needs union-by-name semantics, and
operating it needs visibility into WHICH files lag the current schema.

Two pieces:

- ``read_merged``: the evolution-aware scan — Spark's mergeSchema read
  reconciles all footer schemas into their union; columns absent from
  a file's generation arrive as nulls (exactly DuckDB's
  ``union_by_name``, which is what lets the registry query carry a
  full oracle). Cost note: schema merging lists and reads every
  footer at planning time — fine per-query, but a hot metastore-less
  path should cache the merged schema and pass it explicitly.
- ``schema_drift_report``: per-file schema audit — which files are
  missing which columns of the union schema. The driver loop is over
  FILES (footer reads only, never data), the same boundedness contract
  as the compaction planner: |files| is operator-scale, not row-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_merged(spark, path: str) -> DataFrame:
    """Union-by-name read across schema generations."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def schema_drift_report(spark, path: str) -> DataFrame:
    """One row per data file: (file, n_cols, n_missing, missing_cols)
    where missing_cols are the union-schema columns the file's own
    footer lacks (sorted for determinism). Files at the current schema
    report an empty list — the operational query is
    ``filter(n_missing > 0)``: the backfill worklist.

    Footer-only AND distributed: the file list is parallelized over
    executors and each task reads just its files' parquet footers with
    pyarrow (``pq.read_schema`` seeks to the footer; no data pages
    move). One Spark job regardless of |files| — the previous design
    issued one sequential driver-side ``spark.read.parquet(f)`` per
    file, which crawls at millions of files. The union schema and the
    per-file diff are computed in-plan (explode → distinct → broadcast
    back), so the driver never materializes per-file schemas.

    The union schema comes from the FOOTERS, not a merged read: a
    merged read's schema also carries directory-derived partition
    columns (gen=K), which no footer contains and which would make
    every file look like it lags the union.
    """
    files = sorted(str(f.getPath()) for f in _list_parquet_files(spark, path))
    if not files:
        return spark.createDataFrame(
            [],
            "file STRING, n_cols INT, n_missing INT, missing_cols ARRAY<STRING>",
        )

    def _footer_cols(batches):
        import re

        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                # Hadoop renders local URIs as file:/x or file:///x;
                # pyarrow's LocalFileSystem wants a bare path. Other
                # schemes (s3://, hdfs://) route through from_uri.
                if f.startswith("file:") or "://" not in f:
                    local = re.sub(r"^file:/+", "/", f)
                    names = list(pq.read_schema(local).names)
                else:
                    from pyarrow import fs as pafs

                    filesystem, p = pafs.FileSystem.from_uri(f)
                    names = list(
                        pq.read_schema(p, filesystem=filesystem).names
                    )
                out.append((f, names))
            yield pd.DataFrame(out, columns=["file", "cols"])

    n = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    footers = (
        spark.createDataFrame([(f,) for f in files], "file STRING")
        .repartition(n)
        .mapInPandas(_footer_cols, "file STRING, cols ARRAY<STRING>")
    )
    # union schema is tiny (one row of column names) — broadcast it
    # back onto the footer rows for the per-file diff
    union_df = (
        footers.select(F.explode("cols").alias("c"))
        .distinct()
        .agg(F.sort_array(F.collect_list("c")).alias("_union_cols"))
    )
    return (
        footers.crossJoin(F.broadcast(union_df))
        .select(
            "file",
            F.size("cols").cast("int").alias("n_cols"),
            F.size(F.array_except("_union_cols", "cols"))
            .cast("int")
            .alias("n_missing"),
            F.sort_array(F.array_except("_union_cols", "cols")).alias(
                "missing_cols"
            ),
        )
    )


def _list_parquet_files(spark, path: str):
    from dog_data_pipeline_spark.sources.sharding import _hadoop_fs

    fs, hpath = _hadoop_fs(spark, path)
    out = []
    stack = [hpath]
    while stack:
        p = stack.pop()
        for st in fs.listStatus(p):
            if st.isDirectory():
                stack.append(st.getPath())
            elif st.getPath().getName().endswith(".parquet"):
                out.append(st)
    return out

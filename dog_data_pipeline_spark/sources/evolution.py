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

    Footer-only: schemas come from reading each file's parquet
    metadata, no data pages move; the per-file loop is bounded by file
    count exactly like the compaction planner's.
    """
    files = [
        str(f.getPath())
        for f in _list_parquet_files(spark, path)
    ]
    # the union schema comes from the FOOTERS, not a merged read: a
    # merged read's schema also carries directory-derived partition
    # columns (gen=K), which no footer contains and which would make
    # every file look like it lags the union
    per_file = {f: set(spark.read.parquet(f).columns) for f in sorted(files)}
    union_cols = set().union(*per_file.values()) if per_file else set()
    rows = []
    for f, cols in per_file.items():
        missing = sorted(union_cols - cols)
        rows.append((f, len(cols), len(missing), missing))
    return spark.createDataFrame(
        rows,
        "file STRING, n_cols INT, n_missing INT, missing_cols ARRAY<STRING>",
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

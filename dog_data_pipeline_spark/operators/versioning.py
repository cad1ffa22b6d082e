"""Corpus snapshot diff: classify every document across two corpus
versions as added / removed / changed / unchanged — the audit step
between dataset releases (what actually changed since the corpus the
model was trained on?).

Content comparison uses the same normalized fingerprint as exact dedup,
so whitespace/case churn doesn't read as a change. One full-outer join
on the document key where both sides carry only (id, 16-byte md5) —
at 100 TB the shuffle moves fingerprints, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.text import normalized_text


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, status) for every document in either snapshot, with
    status in {added, removed, changed, unchanged} (b relative to a)."""
    fa = a.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("__fa")
    )
    fb = b.select(
        F.col(id_col), F.md5(normalized_text(F.col(text_col))).alias("__fb")
    )
    j = fa.join(fb, id_col, "full")
    status = (
        F.when(F.col("__fb").isNull(), F.lit("removed"))
        .when(F.col("__fa").isNull(), F.lit("added"))
        .when(F.col("__fa") != F.col("__fb"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status"))

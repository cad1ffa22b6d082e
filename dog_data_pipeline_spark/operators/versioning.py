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


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse an
    event stream into per-key validity intervals of the tracked
    attribute — the standard warehouse shape (Kimball SCD2) that turns
    an append-only change log into a point-in-time-joinable dimension.

    Consecutive equal attribute values (ordered by ts_col then
    tiebreak_cols within each key) merge into one version row:

        (key, version, attr, valid_from, valid_to, n_events, is_current)

    valid_to is the NEXT version's valid_from (half-open interval,
    NULL on the current version) so `valid_from <= t < valid_to` is an
    exact point-in-time lookup. NULL attribute values compare null-safe
    (NULL == NULL is "no change"), so a null-valued run is one version,
    not one per event.

    Scale shape: ONE exchange total. The change-flag window hash-
    partitions on the key; the version groupBy keys on (key, version)
    — HashPartitioning(key) already clusters it, so Catalyst inserts
    no second exchange — and the valid_to lead window partitions on
    the key again, also satisfied. Everything downstream of the single
    shuffle is window + partial-agg over sorted runs.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(attr_col)).over(w)
    first_row = F.row_number().over(w) == 1
    chg = F.when(
        first_row | ~prev.eqNullSafe(F.col(attr_col)), F.lit(1)
    ).otherwise(F.lit(0))
    runs = df.withColumn("__v", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    versions = runs.groupBy(key_col, "__v", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("__v")
    out = versions.withColumn("valid_to", F.lead("valid_from").over(wv))
    return out.select(
        F.col(key_col),
        F.col("__v").cast("int").alias("version"),
        F.col(attr_col),
        "valid_from",
        "valid_to",
        "n_events",
        F.col("valid_to").isNull().alias("is_current"),
    )

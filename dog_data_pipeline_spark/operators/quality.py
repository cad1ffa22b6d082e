"""Data-quality expectation checks (the dbt-tests / Deequ shape): each
check compiles to ONE aggregate counting violations, and the report is
the union of those single-row aggregates — no collects, no UDFs, every
check partial-aggregates and the whole report is one job.

A curation pipeline gates promotion on this report (ship the corpus
only if every row says passed) — cheap enough to run on every
incremental batch because each check is a scan-bound aggregate over
only the columns it references.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    violations: DataFrame  # single-row DataFrame with column n BIGINT


def not_null(df: DataFrame, col: str, name: str | None = None) -> Check:
    return Check(
        name or f"not_null:{col}",
        df.agg(F.count_if(F.col(col).isNull()).alias("n")),
    )


def in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> Check:
    bad = F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
    return Check(
        name or f"in_range:{col}", df.agg(F.count_if(bad).alias("n"))
    )


def accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> Check:
    bad = ~F.col(col).isin(values) | F.col(col).isNull()
    return Check(
        name or f"accepted_values:{col}", df.agg(F.count_if(bad).alias("n"))
    )


def unique(df: DataFrame, cols: list[str], name: str | None = None) -> Check:
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n"))
    )
    return Check(name or f"unique:{','.join(cols)}", dup_rows)


def foreign_key(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
    name: str | None = None,
) -> Check:
    """Rows whose key has no match in the dimension. The dim side is
    reduced to distinct keys; Spark broadcasts it when small, which is
    the normal case for FK targets."""
    orphans = df.join(
        dim.select(F.col(dim_col).alias(col)).distinct(), col, "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    return Check(name or f"foreign_key:{col}", orphans)


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Join-key skew diagnostics: the top-k hottest keys with their row
    counts, each key's share of the table, and its skew factor
    (count / mean-rows-per-key). A skew factor in the hundreds on a
    join key is the signal to reach for salted_join / AQE skew
    handling BEFORE the 100-TB run falls over on one straggler task.

    One partial-aggregated groupBy + a TakeOrdered top-k + a broadcast
    of the 1-row totals — nothing driver-bound.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.count(F.lit(1)).alias("__keys")
    )
    return (
        counts.orderBy(F.col("n_rows").desc(), key_col)
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(key_col),
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("n_rows") / (F.col("__total") / F.col("__keys")), 2
            ).alias("skew_factor"),
        )
    )


def dq_report(checks: list[Check]) -> DataFrame:
    """(check_name, n_violations, passed) — one row per check."""
    out = None
    for c in checks:
        row = c.violations.select(
            F.lit(c.name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    if out is None:
        raise ValueError("no checks given")
    return out


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 10,
    floor: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of one numeric column — the standard train/serve drift
    gauge (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 drifted).

    Binning is ``bins`` fixed-width buckets over the REFERENCE min/max
    (current values clamp into the edge bins, so novel out-of-range
    mass lands visibly in bin 0 or bins-1); per-bin shares are floored
    at ``floor`` before the log so empty bins contribute a finite,
    deterministic penalty. psi = sum (p_cur - p_ref) * ln(p_cur/p_ref).

    Scale shape: one 1-row min/max agg on the reference broadcast into
    both sides, then one ``bins``-row partial agg per side and a
    ``bins``-row join — the samples stream through once, nothing wide.
    Returns one row per bin (bin, p_ref, p_cur, psi_term) plus the
    caller sums psi_term for the scalar.
    """
    stats = ref.agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
    )

    def binned(df: DataFrame, share_name: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / bins
        b = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.col("__lo")) / width).cast("int"),
            ),
        )
        counts = (
            df.crossJoin(F.broadcast(stats))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        total = counts.agg(F.sum("__n").alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("__n") / F.col("__t")).alias(share_name)
        )

    all_bins = ref.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        all_bins.join(binned(ref, "p_ref"), "bin", "left")
        .join(binned(cur, "p_cur"), "bin", "left")
        .fillna(0.0, ["p_ref", "p_cur"])
    )
    pr = F.greatest(F.col("p_ref"), F.lit(floor))
    pc = F.greatest(F.col("p_cur"), F.lit(floor))
    return joined.select(
        "bin", "p_ref", "p_cur", ((pc - pr) * F.log(pc / pr)).alias("psi_term")
    )

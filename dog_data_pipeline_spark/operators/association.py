"""Market-basket association analysis: pairwise co-occurrence rules
with support / confidence / lift.

The reference's catalog joins (src/preprocessed_to_raw.py:26-52) are
lookup-shaped; a training-data pipeline additionally needs the
*co-occurrence* shape — which items appear together inside a grouping
unit (products per order, domains per user session, tags per document).
This module implements the pairwise core of FP-growth-style rule
mining as pure DataFrame algebra:

    baskets  = distinct (basket, item)           -- dedup inside basket
    n_a      = baskets groupBy item              -- item frequencies
    n_ab     = baskets self-join on basket,      -- unordered pair
               item_a < item_b, groupBy pair        co-occurrence
    support  = n_ab / N          confidence(a->b) = n_ab / n_a
    lift     = n_ab * N / (n_a * n_b)

Scale shape (100 TB): the self-join keys both sides on the basket id,
so Catalyst plans ONE shuffle per side onto the same hash partitioning
and joins co-located — no broadcast of the fact table, no cartesian
anywhere. Pair explosion is bounded by the per-basket distinct-item
count k (k·(k-1)/2 rows per basket), the quantity that also bounds
FP-growth's conditional trees; pathological mega-baskets should be
capped upstream (cap_items knob). The item-frequency side is bounded
by the ITEM VOCABULARY, not the corpus, so it broadcasts to the pair
counts — the only join after the pair aggregation is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) pairs — presence, not multiplicity.

    Association metrics are defined over item *presence* per basket;
    the distinct collapses repeated lines (e.g. the same brand on two
    lineitems of one order) map-side before any pair generation.
    """
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    cap_items: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Pairwise association rules over (basket_col, item_col) rows.

    Returns one row per unordered co-occurring item pair (item_a <
    item_b) with ``n_a, n_b, n_ab`` (basket counts), ``support``,
    ``conf_a_to_b``, ``conf_b_to_a`` and ``lift``. ``min_pair_count``
    prunes the long tail BEFORE the frequency joins (the FP-growth
    min-support principle — at corpus scale the singleton-pair tail is
    the bulk of the pair table). ``cap_items`` optionally drops baskets
    with more than that many distinct items (mega-basket guard: a
    crawler session with 10k distinct domains would alone emit 50M
    pairs).

    All ratios are computed bigint/double in a fixed operation order so
    an external SQL engine replaying the same formula bit-matches.
    """
    b = basket_items(df, basket_col, item_col)
    if cap_items is not None:
        sizes = b.groupBy("basket").agg(F.count(F.lit(1)).alias("__k"))
        b = (
            b.join(sizes.filter(F.col("__k") <= cap_items), "basket", "left_semi")
        )
    # b feeds FOUR scans (basket total, item counts, both pair-join
    # sides); Spark cannot share a subtree across DAG branches, so
    # without materialization the upstream dedup pipeline re-executes
    # per scan (measured ~4x the distinct cost on the brand-basket
    # query). The materialized table is the DEDUPED (basket, item)
    # projection — two narrow columns, far smaller than the fact table
    # that produced it — the standard persist() point of any multi-use
    # rule-mining pipeline. materialize=False keeps lineage for plan
    # tests.
    if materialize:
        b = b.localCheckpoint(eager=True)
    # one scalar: total baskets. Kept in-plan as a broadcast 1-row join
    # (no .collect() — the rule table stays a single lazy plan).
    n_baskets = b.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets")
    )
    item_counts = b.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    left = b.select(F.col("basket"), F.col("item").alias("item_a"))
    right = b.select(F.col("basket"), F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= F.lit(int(min_pair_count)))
    )
    # item_counts is |vocabulary| rows — broadcast both lookups so the
    # only shuffle after pair aggregation is none at all.
    ia = F.broadcast(
        item_counts.select(
            F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
        )
    )
    ib = F.broadcast(
        item_counts.select(
            F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
        )
    )
    out = (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        (F.col("n_ab") / F.col("n_baskets")).alias("support"),
        (F.col("n_ab") / F.col("n_a").cast("double")).alias("conf_a_to_b"),
        (F.col("n_ab") / F.col("n_b").cast("double")).alias("conf_b_to_a"),
        (
            F.col("n_ab") * F.col("n_baskets")
            / (F.col("n_a") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )

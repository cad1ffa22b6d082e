"""Aggregation operators (SURVEY.md §2.4).

All are plain groupBy aggregations — Spark automatically splits them into
partial (map-side combine) + final phases, so each shuffles only the
per-group partial state, never raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_collect(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str | Sequence[str],
    value: str,
    out: str = "seq",
) -> DataFrame:
    """Order-forced collect per key (SURVEY A5) — an engine INVARIANT.

    The reference gets frame order implicitly from sequential decode
    (``src/raw_to_samples.py:156-164,181-193``); in Spark a bare
    ``collect_list`` is NONDETERMINISTIC across retries/partitionings, so
    the engine always collects ``struct(*order_by, value)``, sorts the
    array, then projects the value — deterministic at any parallelism.

    Pass multiple `order_by` columns when the leading key is not unique
    within a group; ties on a non-unique order key would otherwise be
    engine/partitioning-dependent.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    fields = [F.col(c) for c in order_cols]
    if value not in order_cols:
        fields.append(F.col(value))
    pairs = F.sort_array(F.collect_list(F.struct(*fields)))
    return df.groupBy(*keys).agg(
        F.transform(pairs, lambda s: s[value]).alias(out)
    )


def conditional_frequency_filter(
    df: DataFrame,
    keys: Sequence[str],
    predicate: Column,
    threshold: float,
    freq_col: str = "freq",
) -> DataFrame:
    """Grouped conditional frequency with HAVING (SURVEY A2).

    Generalizes the is-it-a-dog filter at ``src/raw_to_samples.py:147-153``:
    per key, the fraction of rows satisfying `predicate`; keep keys with
    fraction > `threshold`. One partial-aggregated shuffle.
    """
    return (
        df.groupBy(*keys)
        .agg(F.avg(F.when(predicate, 1.0).otherwise(0.0)).alias(freq_col))
        .filter(F.col(freq_col) > threshold)
    )


def completeness_filter(
    df: DataFrame,
    keys: Sequence[str],
    expected: Column | int,
    count_col: str = "n",
) -> DataFrame:
    """Keep keys present in EVERY slot (SURVEY A3).

    Generalizes the drop-subjects-missing-in-any-frame check at
    ``src/raw_to_samples.py:211-216``: per-key count == expected total.
    `expected` may be a literal or a Column (e.g. attached via
    ``with_scalar``).
    """
    exp = F.lit(expected) if isinstance(expected, int) else expected
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) == exp)
    )


def grouped_max_pad(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, Column],
    pad: float = 0.0,
) -> DataFrame:
    """Per-key max of derived measures, plus a constant pad (SURVEY A1).

    Generalizes the max-bbox-extent (+10px) aggregate at
    ``src/raw_to_samples.py:59-72``: ``{out_name: measure_expr}`` each
    aggregated with max then padded.
    """
    aggs = [(F.max(expr) + F.lit(pad)).alias(name) for name, expr in measures.items()]
    return df.groupBy(*keys).agg(*aggs)


def approx_quantiles_certified(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float],
    accuracy: int = 1000,
) -> DataFrame:
    """Mergeable quantile sketch with a SELF-CERTIFYING rank bound —
    the sketch-family companion to ``approx_distinct_parts`` (HLL) and
    ``heavy_hitters_cms`` (CMS).

    ``approx_percentile`` is Spark's Greenwald-Khanna sketch: mergeable
    partial aggregates (one pass, map-side combine — the only way to
    take percentiles of 100 TB without a global sort), with the GK
    contract that the returned ELEMENT occupies some rank within
    N/accuracy of p*N. With duplicated values an element's rank is a
    RANGE [count(< v) + 1, count(<= v)] (a single tied value can span
    thousands of ranks — count(<= median) alone would fail the check
    on any low-cardinality column), so the certificate recomputes both
    counts distributedly (one conditional-sum pass, no sort) and emits

        rank_bound_ok = [count(<v)+1, count(<=v)] intersects
                        [p*N - N/accuracy - 1, p*N + N/accuracy + 1]

    (+-1 absorbs floor/ceil discreteness). A SQL oracle asserts the
    column is TRUE for every (col, prob): the sketch's accuracy
    contract is hash-checked, not trusted.

    The estimates themselves are collected to the driver between the
    two passes — len(cols) x len(probs) scalars, bounded regardless of
    data size.

    Returns ``(measure STRING, prob DOUBLE, rank_bound_ok BOOLEAN)``.
    """
    probs = list(probs)
    # Per-column NON-NULL counts: percentile_approx and the rank sums
    # below ignore NULLs, so the certificate must rank against the same
    # population (count(1) would inflate N on a nullable column and
    # wrongly fail/pass the bound).
    ests = df.agg(
        *[
            F.percentile_approx(c, probs, accuracy).alias(c)
            for c in cols
        ],
        *[F.count(F.col(c)).alias(f"__n_{c}") for c in cols],
    ).collect()[0]
    rank_aggs = []
    for c in cols:
        if ests[c] is None:  # empty / all-NULL column: nothing to certify
            continue
        for i, p in enumerate(probs):
            v = ests[c][i]
            rank_aggs.append(
                F.sum(F.when(F.col(c) <= F.lit(v), 1).otherwise(0)).alias(
                    f"__le_{c}_{i}"
                )
            )
            rank_aggs.append(
                F.sum(F.when(F.col(c) < F.lit(v), 1).otherwise(0)).alias(
                    f"__lt_{c}_{i}"
                )
            )
    rows = []
    if rank_aggs:
        ranks = df.agg(*rank_aggs).collect()[0]
        for c in cols:
            if ests[c] is None:
                continue
            n = ests[f"__n_{c}"]
            eps_slack = n / accuracy + 1
            for i, p in enumerate(probs):
                lo = (ranks[f"__lt_{c}_{i}"] or 0) + 1
                hi = ranks[f"__le_{c}_{i}"] or 0
                ok = lo <= p * n + eps_slack and hi >= p * n - eps_slack
                rows.append((c, float(p), bool(ok)))
    return df.sparkSession.createDataFrame(
        rows, "measure STRING, prob DOUBLE, rank_bound_ok BOOLEAN"
    )

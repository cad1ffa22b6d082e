"""Incremental (delta) maintenance of aggregate state — the
materialized-view pattern that makes corpus statistics affordable at
100 TB: a nightly batch must update per-source counts WITHOUT
rescanning the corpus, so the stored state holds mergeable PARTIALS
(count, sum, min, max — the algebraic aggregates of Gray et al.'s
cube paper) and each new batch folds in as

    new_state = re-aggregate( state UNION batch_partials )

where ``state`` is |keys| rows (kilobytes) and only the BATCH is
scanned. Derived statistics that are not themselves mergeable (mean =
sum/count) are computed at read time from the partials — never stored,
or increments would be wrong.

Holistic aggregates (exact distinct counts, exact medians) do NOT
merge this way; for those the engine's sketch family
(``approx_distinct_parts`` HLL partials, ``heavy_hitters_cms``,
``approx_quantiles_certified``) provides the mergeable representation.
The ``distinct_partials`` / ``merge_distinct_state`` trio below closes
the gap for distinct counts specifically: stored Datasketches HLL
sketches (``hll_sketch_agg``) merge register-wise (``hll_union_agg``),
so per-key distinct-count state updates from batch sketches alone —
the same union-then-reaggregate shape as the algebraic partials, with
|keys| x 2^lg_k bytes of state and documented error instead of a
rescan.

The correctness obligation of ANY incremental pipeline is
incremental == full recompute; the registry query certifies exactly
that equality against the DuckDB oracle's full-corpus aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the partial-state columns this module maintains per (keys, measure):
# __cnt (row count), __sum, __min, __max
_STATE_COLS = ("__cnt", "__sum", "__min", "__max")


def aggregate_partials(
    df: DataFrame, key_cols: Sequence[str], measure_col: str
) -> DataFrame:
    """Fold a (batch of) rows into mergeable partial state:
    ``(keys..., __cnt, __sum, __min, __max)`` — one partial-aggregated
    shuffle, map-side combine bounds shuffle volume by |keys|."""
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(measure_col).alias("__sum"),
        F.min(measure_col).alias("__min"),
        F.max(measure_col).alias("__max"),
    )


def merge_aggregate_state(
    state: DataFrame, batch_partials: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Fold batch partials into stored state: union + re-aggregate with
    each partial's MERGE function (cnt/sum merge by sum, min by min,
    max by max). Both inputs are |keys|-row partial tables — the merge
    never touches corpus rows. Keys present in only one side pass
    through unchanged (union semantics)."""
    u = state.select(*key_cols, *_STATE_COLS).unionByName(
        batch_partials.select(*key_cols, *_STATE_COLS)
    )
    return u.groupBy(*key_cols).agg(
        F.sum("__cnt").alias("__cnt"),
        F.sum("__sum").alias("__sum"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def read_state(state: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Materialize the user-facing view of partial state: counts, sum,
    min, max, and the read-time-derived mean in exact integer
    micro-units (floor(sum/cnt * 1e6 + 0.5) — integer partials make the
    division bit-reproducible cross-engine)."""
    return state.select(
        *key_cols,
        F.col("__cnt").cast("long").alias("n_rows"),
        F.col("__sum").cast("long").alias("total"),
        F.col("__min").cast("long").alias("min_val"),
        F.col("__max").cast("long").alias("max_val"),
        F.floor(
            F.col("__sum").cast("double") / F.col("__cnt") * 1e6 + F.lit(0.5)
        )
        .cast("long")
        .alias("mean_u"),
    )


def distinct_partials(
    df: DataFrame, key_cols: Sequence[str], distinct_col: str, lg_k: int = 12
) -> DataFrame:
    """Fold a (batch of) rows into mergeable DISTINCT-count state: one
    Datasketches HLL_4 sketch per key (``(keys..., __hll)``). The
    sketch is 2^lg_k registers (4 KiB at the default lg_k=12, relative
    standard error ~1.04/sqrt(2^12) = 1.6%); small cardinalities stay
    in the sketch's exact sparse mode. One partial-aggregated shuffle —
    map-side combine merges sketches before the exchange, so shuffle
    volume is |keys| x 4 KiB regardless of row count."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("__hll")
    )


def merge_distinct_state(
    state: DataFrame, batch_partials: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Fold batch HLL partials into stored distinct-count state:
    union + register-wise sketch union (``hll_union_agg``). Like
    ``merge_aggregate_state``, both inputs are |keys|-row state tables
    and the corpus is never rescanned — the whole point: exact distinct
    is holistic (non-mergeable), the sketch representation is
    algebraic."""
    u = state.select(*key_cols, "__hll").unionByName(
        batch_partials.select(*key_cols, "__hll")
    )
    return u.groupBy(*key_cols).agg(F.hll_union_agg("__hll").alias("__hll"))


def read_distinct_state(
    state: DataFrame, key_cols: Sequence[str], out: str = "distinct_est"
) -> DataFrame:
    """Materialize the user-facing view: per-key estimated distinct
    count from the stored sketch."""
    return state.select(
        *key_cols, F.hll_sketch_estimate("__hll").cast("long").alias(out)
    )

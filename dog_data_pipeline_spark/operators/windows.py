"""Window / partition-analytic / tumbling-window operators (SURVEY §2.5, §2.9)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partition_max(
    df: DataFrame, keys: Sequence[str], measures: dict[str, Column]
) -> DataFrame:
    """Attach per-partition max of derived measures to every row (SURVEY W1).

    Generalizes the resize-every-bbox-to-its-subject's-max transform at
    ``src/raw_to_samples.py:59-90``. A single Window physical operator
    (one shuffle on `keys`) replaces the reference's build-dict-then-probe
    two-pass; no join needed.
    """
    w = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = df
    for name, expr in measures.items():
        out = out.withColumn(name, F.max(expr).over(w))
    return out


def tumbling_bucket(
    df: DataFrame,
    ts: str,
    duration_sec: int,
    out: str = "win_start",
) -> DataFrame:
    """Tumbling-window bucketing on an event-time axis (SURVEY T1).

    Generalizes the 2-second frame segmentation at
    ``src/raw_to_samples.py:16,330-336`` to real timestamps: the window
    start epoch = floor(epoch(ts)/duration)*duration. Pure column
    expression — batch form of ``F.window(ts, f"{d} seconds")`` (the
    streaming variant in ``streaming/`` uses F.window + watermark).
    """
    win = (F.floor(F.unix_timestamp(F.col(ts)) / duration_sec) * duration_sec).cast(
        "bigint"
    )
    return df.withColumn(out, win)


def drop_incomplete_windows(
    df: DataFrame,
    window_keys: Sequence[str],
    expected: Column | int,
) -> DataFrame:
    """Drop windows with fewer than `expected` rows (SURVEY T2).

    Generalizes the trailing-partial-segment drop at
    ``src/raw_to_samples.py:339-341``. Implemented as a window-count
    attached per row + filter, so surviving rows keep full detail.
    """
    exp = F.lit(expected) if isinstance(expected, int) else expected
    w = Window.partitionBy(*window_keys)
    return (
        df.withColumn("__wn", F.count(F.lit(1)).over(w))
        .filter(F.col("__wn") >= exp)
        .drop("__wn")
    )

"""Stream-stream joins (SURVEY §2.9 extension): the event-time interval
join Structured Streaming supports natively, packaged with the state
hygiene that makes it safe to run forever.

A stream-stream join buffers BOTH sides in state; without watermarks and
a time-range join condition that state grows without bound. The
operators here force both: each input gets a watermark, and the join
predicate includes ``right.ts ∈ [left.ts - lower, left.ts + upper]``
(lower reaches BACK, matching the function signature) so the engine can
evict rows once the watermark passes their latest possible match
window. State per key is then O(rate × interval), not
O(stream length) — the property that holds at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "interval 5 minutes",
    upper: str = "interval 5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Key-equality + event-time-interval join of two streams.

    Matches ``l`` with every ``r`` sharing ``keys`` whose timestamp lies
    in ``[l.ts - lower, l.ts + upper]``. Both sides are watermarked with
    the same delay; for outer joins Spark additionally requires the
    interval condition to emit nulls once state expires — supported here
    ('leftOuter'/'rightOuter' pass through).

    Column naming: right-side non-key columns come back prefixed
    ``r_``, the two timestamps as ``ts`` (left) and ``r_ts`` — explicit
    names because a stream-stream join of two events-shaped inputs is
    otherwise all-ambiguous.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    key_set = set(keys)
    rw = rw.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in key_set
        ],
    )
    r_ts = f"r_{right_ts}" if right_ts not in key_set else right_ts
    cond = F.lit(True)
    for k in keys:
        cond = cond & (lw[k] == rw[k])
    cond = (
        cond
        & (F.col(r_ts) >= F.expr(f"{left_ts} - {lower}"))
        & (F.col(r_ts) <= F.expr(f"{left_ts} + {upper}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicate right-side key columns the raw condition keeps
    return joined.drop(*[rw[k] for k in keys])

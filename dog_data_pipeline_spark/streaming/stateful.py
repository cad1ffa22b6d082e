"""Custom stateful streaming operator (SURVEY T3).

The reference's YOLO tracker carries identity state frame-to-frame
within a segment (``raw_to_samples.py:187`` persist=True). The
generalized streaming form: per-key arbitrary state across micro-batches
via ``applyInPandasWithState`` — here a running track accumulator
(count / max / last event time per key), the state shape a tracker
carries between frames.

State never crosses a key boundary — Spark hash-partitions by the
groupBy key, so this scales exactly like the batch pipeline's
(video, segment) partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

TRACK_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_max", DoubleType()),
    ]
)

TRACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_max", DoubleType()),
        StructField("batch_max_ts", TimestampType()),
    ]
)


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vmax = state.get if state.exists else (0, float("-inf"))
    batch_max_ts = None
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
            ts = pdf["ts"].max()
            batch_max_ts = ts if batch_max_ts is None else max(batch_max_ts, ts)
    state.update((n, vmax))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_max": [vmax],
            "batch_max_ts": [batch_max_ts],
        }
    )


def running_track_state(events: DataFrame) -> DataFrame:
    """Per-user running (count, max) maintained across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=TRACK_OUTPUT_SCHEMA,
        stateStructType=TRACK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

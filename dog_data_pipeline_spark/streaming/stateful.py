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


def running_track_state(events: DataFrame) -> DataFrame:
    """Per-user running (count, max) maintained across micro-batches.

    The accumulator is a NESTED function on purpose: a module-level
    function handed to ``applyInPandasWithState`` serializes by
    reference, so python workers must be able to import this package —
    which breaks under a driver whose cwd isn't the repo root. A nested
    function serializes by value and runs anywhere.
    """

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
                batch_max_ts = (
                    ts if batch_max_ts is None else max(batch_max_ts, ts)
                )
        state.update((n, vmax))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "value_max": [vmax],
                "batch_max_ts": [batch_max_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=TRACK_OUTPUT_SCHEMA,
        stateStructType=TRACK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- the modern Spark 4 typed-state API (transformWithStateInPandas) ------

PEAK_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def new_peak_events(events: DataFrame) -> DataFrame:
    """Per-key 'new peak' detector via ``transformWithStateInPandas``
    (Spark 4's successor to applyInPandasWithState: typed state handles,
    explicit lifecycle): emits only events that exceed their key's
    running maximum — the kind of per-track threshold logic a tracker
    applies frame-over-frame, with state owned by the engine's RocksDB
    store and partitioned by key.

    Environment note: the TWS state protocol needs the ``protobuf``
    python package (absent from this image; re-probed each round, last
    2026-08-16 r10: still ``ModuleNotFoundError``) and the RocksDB
    state store provider — ``running_track_state``
    (applyInPandasWithState) is the dependency-free equivalent.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PeakProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._peak = handle.getValueState(
                "peak", StructType([StructField("v", DoubleType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            peak = self._peak.get()[0] if self._peak.exists() else float("-inf")
            out = []
            for pdf in rows:
                pdf = pdf.sort_values("event_id")
                for eid, v in zip(pdf["event_id"], pdf["value"]):
                    if float(v) > peak:
                        peak = float(v)
                        out.append((key[0], int(eid), float(v)))
            self._peak.update((peak,))
            if out:
                yield pd.DataFrame(out, columns=["user_id", "event_id", "value"])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        PeakProcessor(),
        outputStructType=PEAK_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )

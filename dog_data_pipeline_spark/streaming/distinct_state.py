"""Streaming distinct-count state: maintain per-key HLL sketches from a
stream (the streaming face of ``operators.incremental.distinct_partials``
— SURVEY §2.9 extension, completing the incremental-aggregate family
for the holistic distinct count).

Each micro-batch folds its own |keys|-row sketch partials into the
persisted state with a register-wise union, then stage-then-swaps the
state directory — per-batch cost is O(batch) + |keys| x 4 KiB of state,
never a re-scan of history.

Exactly-once comes FREE from the sketch algebra: HLL union is
idempotent (registers are max'ed, so re-merging the same values is a
no-op on the registers), which makes foreachBatch's at-least-once
replay safe with no dedup bookkeeping at all — the one aggregate family
where crash-replay correctness needs zero extra machinery. (Contrast
the count/sum partials of ``incremental.merge_aggregate_state``, which
would double-count on replay and need a batch-id ledger.)
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame


def distinct_state_stream(
    stream: DataFrame,
    state_path: str,
    checkpoint: str,
    key_cols: Sequence[str],
    distinct_col: str,
    lg_k: int = 12,
    trigger_available_now: bool = True,
):
    """Start the distinct-count state maintainer; returns the
    StreamingQuery. ``state_path`` holds the current (keys..., __hll)
    table; read it back through ``read_distinct_counts``."""
    from dog_data_pipeline_spark.operators.incremental import (
        distinct_partials,
        merge_distinct_state,
    )
    from dog_data_pipeline_spark.sources.sharding import _hadoop_fs

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if not batch.columns:
            return
        spark = batch.sparkSession
        fs, hpath = _hadoop_fs(spark, state_path)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        root = state_path.rstrip("/")
        backup = jpath(f"{root}.old")
        # crash recovery: a previous attempt that died between its two
        # renames leaves the state only under the DETERMINISTIC backup
        # name — restore it before reading, so no crash point ever
        # silently re-initializes state from one batch. (Backup names
        # must not be random: an unrecoverable uuid name is exactly how
        # accumulated state would be lost.)
        if not fs.exists(hpath) and fs.exists(backup):
            if not fs.rename(backup, hpath):
                raise IOError(f"state recovery failed: {backup} -> {state_path}")
        # clean up staging dirs orphaned by crashed attempts (each
        # attempt uses a fresh uuid, so without this every crash leaks
        # a full |keys|-row copy of the state forever)
        for st in fs.globStatus(jpath(f"{root}.staging-*")) or []:
            fs.delete(st.getPath(), True)
        partials = distinct_partials(batch, key_cols, distinct_col, lg_k)
        if fs.exists(hpath):
            state = spark.read.parquet(state_path)
            merged = merge_distinct_state(state, partials, key_cols)
        else:
            merged = partials
        # stage-then-swap: never leave the state dir half-written (a
        # reader or a crashed overwrite must always see a complete
        # previous state). The state is |keys| rows — one staging write
        # + two renames; every crash window leaves the state readable
        # either at state_path or at the fixed backup name above.
        staging = f"{root}.staging-{uuid.uuid4().hex}"
        merged.coalesce(1).write.mode("overwrite").parquet(staging)
        if fs.exists(backup):
            fs.delete(backup, True)
        if fs.exists(hpath):
            if not fs.rename(hpath, backup):
                raise IOError(f"state swap failed: {state_path} -> {backup}")
        if not fs.rename(jpath(staging), hpath):
            raise IOError(f"state swap failed: {staging} -> {state_path}")
        if fs.exists(backup):
            fs.delete(backup, True)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_distinct_counts(
    spark, state_path: str, key_cols: Sequence[str]
) -> DataFrame:
    """Current per-key distinct estimates from the persisted state."""
    from dog_data_pipeline_spark.operators.incremental import (
        read_distinct_state,
    )

    return read_distinct_state(spark.read.parquet(state_path), key_cols)

"""Streaming dead-letter routing (SURVEY T5, streaming form).

The batch form is operators/dead_letter.split_status; in streaming the
split happens inside ``foreachBatch`` so both branches share one
micro-batch scan and each gets its own sink — the exactly-once pattern
for dual sinks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dead_letter_for_each_batch(
    ok: Column,
    error_expr: Column,
    ok_sink: Callable[[DataFrame, int], None],
    err_sink: Callable[[DataFrame, int], None],
    error_col: str = "error",
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function routing each micro-batch into an ok
    sink and a dead-letter sink carrying `error_expr`."""

    def route(batch: DataFrame, epoch_id: int) -> None:
        batch = batch.persist()
        try:
            ok_sink(batch.filter(ok), epoch_id)
            err_sink(
                batch.filter(~ok | ok.isNull()).withColumn(error_col, error_expr),
                epoch_id,
            )
        finally:
            batch.unpersist()

    return route

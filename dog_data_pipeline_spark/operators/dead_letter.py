"""Dead-letter routing (SURVEY T5).

Generalizes the per-segment try/except success-vs-error ledgers at
``src/raw_to_samples.py:315-316,357-396``: a status-column split into an
ok branch and an error branch carrying an error description. Both
branches are filters over one scan — Spark evaluates the source once per
branch but pushes each filter into it; with ``persist()`` callers can
share the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_status(
    df: DataFrame,
    ok: Column,
    error_expr: Column | None = None,
    error_col: str = "error",
) -> tuple[DataFrame, DataFrame]:
    """Split into (ok_df, dead_letter_df).

    `ok` is the validity predicate; rows failing it go to the dead-letter
    branch with `error_expr` (default: a generic message) in `error_col`.
    """
    err = error_expr if error_expr is not None else F.lit("validation failed")
    ok_df = df.filter(ok)
    err_df = df.filter(~ok | ok.isNull()).withColumn(error_col, err)
    return ok_df, err_df

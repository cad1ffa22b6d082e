"""Distributed file copy/movement sink (SURVEY S11, with S12
idempotence).

The reference copies files one-by-one in a driver loop
(``preprocessed_to_raw.py:45``, ``preprocess_dataset.py:73-74,129``,
``raw_to_samples.py:364-367``). Here the copy plan is a DataFrame
(src_path, dst_path) and the side effect runs in ``foreachPartition`` —
each task copies its partition's files, so a million-file movement
parallelizes across the cluster and retries at task granularity.

Idempotence: ``plan_copies`` anti-joins against the destination listing,
so re-runs skip completed work (the skip-if-exists at
``preprocess_dataset.py:54-56``) — and a task retry re-copying a file is
harmless (same content, same name).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.relational import anti_join


def plan_copies(
    listing: DataFrame,
    dst_dir: str,
    name_col: str = "dst_name",
    src_col: str = "path",
    done: DataFrame | None = None,
) -> DataFrame:
    """(src path, dst name) → copy plan, minus already-copied files."""
    plan = listing.select(
        F.col(src_col).alias("src_path"),
        F.concat(F.lit(dst_dir.rstrip("/") + "/"), F.col(name_col)).alias("dst_path"),
    )
    if done is not None:
        plan = anti_join(plan, done.select("dst_path"), "dst_path")
    return plan


def execute_copies(plan: DataFrame) -> int:
    """Run the copy plan with foreachPartition; returns planned count.

    Uses local-filesystem copy; on object storage the partition function
    would hold an s3/gcs client — the shape (client per task, copy per
    row) is identical.
    """
    n = plan.count()

    def copy_partition(rows) -> None:
        for row in rows:
            src = row["src_path"].removeprefix("file:")
            dst = row["dst_path"].removeprefix("file:")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if not os.path.exists(dst):  # idempotent under task retry
                shutil.copy(src, dst)

    plan.foreachPartition(copy_partition)
    return n

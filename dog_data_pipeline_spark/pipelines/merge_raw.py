"""Stage 2 — merge a normalized dataset into the raw catalog.

Re-expresses ``src/preprocessed_to_raw.py`` (add_to_raw): continue the
dense file_index from the catalog max, assign '%06d.mp4' names, append
via union — with the two scale fixes SURVEY §7.4 flags:

- dense IDs via the adaptive zipWithIndex operator, not append order;
- the caller must write the result with stage-then-swap (see
  ``sources.catalog``) — the reference's read-modify-overwrite of
  ``labels.csv`` (``preprocessed_to_raw.py:26-52``) is unsafe under
  concurrent readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators import dense_ids

CATALOG_COLUMNS = [
    "file_index",
    "file_path",
    "dataset",
    "action",
    "original_file_path",
]  # (``preprocessed_to_raw.py:19``)


def merge_to_raw(
    catalog: DataFrame | None,
    manifest: DataFrame,
    dataset_name: str,
) -> DataFrame:
    """(catalog?, manifest(file_path, action)) → new catalog.

    New rows get file_index = catalog_max + 1 .. (+n) in manifest
    file_path order (deterministic, unlike the reference's dict
    iteration order) and file_path = '%06d.mp4'
    (``preprocessed_to_raw.py:37-46``).
    """
    if catalog is not None and catalog.head(1):
        offset = catalog.agg(F.max("file_index")).collect()[0][0] + 1
    else:
        offset = 0  # current_index = 0 on first run (``:31``)

    new_rows = dense_ids(
        manifest.select(
            F.col("file_path").alias("original_file_path"), "action"
        ),
        "original_file_path",
        out="file_index",
        offset=offset,
    ).select(
        "file_index",
        F.format_string("%06d.mp4", F.col("file_index")).alias("file_path"),
        F.lit(dataset_name).alias("dataset"),
        "action",
        "original_file_path",
    )
    if catalog is None:
        return new_rows.select(*CATALOG_COLUMNS)
    return catalog.select(*CATALOG_COLUMNS).unionByName(new_rows)

"""JSON manifest-map source/sink (SURVEY S4/S5).

The reference serializes a ``{file_path: action}`` dict as ONE JSON
object (``preprocess_dataset.py:77-79``) and loads it back
(``preprocessed_to_raw.py:33-34``). Tabular form: a 2-column DataFrame.

Reading uses ``from_json`` into MapType + explode — works for any key
set without a declared per-key schema. Writing in exact single-object
parity collects to the driver — acceptable for manifest-sized maps
(they key a dataset's FILES, not its rows); the scalable alternative
(JSON-lines of 2-col rows) is ``df.write.json``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType


def read_json_map(
    spark: SparkSession,
    path: str,
    key_col: str = "file_path",
    value_col: str = "action",
) -> DataFrame:
    """Single-JSON-object map file → 2-column DataFrame."""
    raw = spark.read.text(path, wholetext=True)
    parsed = raw.select(
        F.explode(
            F.from_json(F.col("value"), MapType(StringType(), StringType()))
        ).alias(key_col, value_col)
    )
    return parsed


def write_json_map(
    df: DataFrame,
    path: str,
    key_col: str = "file_path",
    value_col: str = "action",
) -> None:
    """2-column DataFrame → single JSON object file (exact reference
    layout parity). Driver-side by design — see module docstring."""
    rows = df.select(key_col, value_col).collect()
    mapping = {r[key_col]: r[value_col] for r in rows}
    with open(path, "w") as f:
        json.dump(mapping, f)

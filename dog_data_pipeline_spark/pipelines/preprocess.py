"""Stage 1 — dataset normalization into a path→action manifest.

Re-expresses ``src/preprocess_dataset.py`` as one declarative transform
over a file-listing table (FIXTURES.md B7): extension filter, path
derivations, folder→action / label→action recodes with pass-through,
idempotent skip — all Catalyst expressions; the row loop with per-row
copy side effects becomes a DataFrame the caller feeds to a copy sink
(sources.file_sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators import anti_join, recode_with_fallthrough

# folder-name → action mapping (``preprocess_dataset.py:14-19``)
FOLDER_ACTIONS = {
    "dogs_eating": "eat",
    "dogs_playing": "play",
    "dogs_sleeping": "sleep",
    "dogs_walking": "walk",
}

# a2d label recode (``preprocess_dataset.py:103-111``) — labels 71/74 are
# intentionally absent: pandas .replace passes them through unchanged
A2D_LABEL_ACTIONS = {72: "play", 73: "run", 75: "eat", 76: "play", 77: "walk", 78: "run"}
A2D_KEEP_LABELS = list(range(71, 79))  # IN-filter (``preprocess_dataset.py:98,101``)

VIDEO_EXTENSIONS = ["mp4", "mov"]


def derive_action_manifest(
    listing: DataFrame,
    already_done: DataFrame | None = None,
    path_col: str = "path",
) -> DataFrame:
    """File listing → (path, action) manifest.

    - keep only video extensions (``preprocess_dataset.py:12,26``);
    - action from the parent folder name (``:14-29``): path component
      -2, recoded via FOLDER_ACTIONS (unknown folders drop out);
    - idempotent skip of paths already present in `already_done`
      (``:54-56``) via anti-join.
    """
    ext = F.regexp_extract(F.col(path_col), r"\.([^.]+)$", 1)
    parts = F.split(F.col(path_col), "/")
    folder = F.element_at(parts, -2)
    out = (
        listing.filter(F.lower(ext).isin(VIDEO_EXTENSIONS))
        .withColumn("__folder", folder)
        .filter(F.col("__folder").isin(list(FOLDER_ACTIONS)))
    )
    out = recode_with_fallthrough(out, "__folder", FOLDER_ACTIONS, out="action")
    out = out.select(F.col(path_col).alias("file_path"), "action")
    if already_done is not None:
        out = anti_join(out, already_done.select("file_path"), "file_path")
    return out


def a2d_manifest(videoset: DataFrame) -> DataFrame:
    """a2d videoset.csv → (youtube_id, action) manifest.

    IN-filter on labels 71..78, then recode with pass-through: labels
    71/74 keep their NUMERIC value as the action string — faithful to
    pandas ``.replace`` (``preprocess_dataset.py:98-113``).
    """
    kept = videoset.filter(F.col("action_label").isin(A2D_KEEP_LABELS))
    # stringify first: the recode maps int keys to string actions, and the
    # fallthrough branch must share the CASE's result type
    recoded = recode_with_fallthrough(
        kept.withColumn("__lbl", F.col("action_label").cast("string")),
        "__lbl",
        {str(k): v for k, v in A2D_LABEL_ACTIONS.items()},
        out="action",
    )
    return recoded.select("youtube_id", "action")

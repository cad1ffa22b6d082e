"""Named pipelines mirroring the reference's 3-stage structure
(README.md:6-32 of the reference), composed from the generic operator
library. The dispatch-by-name pattern (``preprocess_dataset.py:143-144``)
becomes a registry dict.
"""

from dog_data_pipeline_spark.pipelines.preprocess import (  # noqa: F401
    derive_action_manifest,
)
from dog_data_pipeline_spark.pipelines.merge_raw import merge_to_raw  # noqa: F401
from dog_data_pipeline_spark.pipelines.tracking import (  # noqa: F401
    segment_frames,
    select_complete_dog_tracks,
    track_samples_pipeline,
    transform_tracks_max_extent,
)

PIPELINES = {
    "preprocess": derive_action_manifest,
    "merge_to_raw": merge_to_raw,
    "raw_to_samples": track_samples_pipeline,
}

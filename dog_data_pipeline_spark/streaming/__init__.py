"""Structured Streaming variants of the windowed operators (SURVEY §2.9)."""

from dog_data_pipeline_spark.streaming.windows import (  # noqa: F401
    dedup_stream,
    flagship_stream,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)
from dog_data_pipeline_spark.streaming.routing import (  # noqa: F401
    dead_letter_for_each_batch,
)
from dog_data_pipeline_spark.streaming.multimodal import (  # noqa: F401
    ingest_video_detections,
    stream_blob_table,
    track_stream,
)
from dog_data_pipeline_spark.streaming.joins import (  # noqa: F401
    interval_join_streams,
)
from dog_data_pipeline_spark.streaming.upsert import (  # noqa: F401
    upsert_sink,
)
from dog_data_pipeline_spark.streaming.dedup_incremental import (  # noqa: F401
    dedup_stream_incremental,
    read_dup_pairs,
)
from dog_data_pipeline_spark.streaming.distinct_state import (  # noqa: F401
    distinct_state_stream,
    read_distinct_counts,
)

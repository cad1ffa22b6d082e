"""Multimodal (video/image) column operators (SURVEY §2.1 S7-S10, §2.10
F1-F5).

Images/videos are opaque BINARY columns with typed metadata. The
Spark-side plumbing — schemas, (video, segment) partitioning, Arrow
batch shapes, load-once-per-partition model lifecycle — is real and
tested; the actual codec calls (cv2/ffmpeg/YOLO are not in this image)
are isolated behind ``codec.py``, which ships a deterministic fake
format for tests and raises NotImplementedError for real media unless
cv2 is importable.
"""

from dog_data_pipeline_spark.multimodal.video import (  # noqa: F401
    decode_frames,
    encode_tracks,
    probe_metadata,
    run_tracking,
)

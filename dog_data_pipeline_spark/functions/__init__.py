"""Column-expression function library."""

from dog_data_pipeline_spark.functions.geometry import (  # noqa: F401
    bbox_area,
    bbox_center,
    bbox_dims,
    recenter_clamp,
)

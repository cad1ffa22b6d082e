"""Composable DataFrame -> DataFrame operators (SURVEY.md §2)."""

from dog_data_pipeline_spark.operators.relational import (  # noqa: F401
    anti_join,
    dense_ids,
    recode_with_fallthrough,
    recode_with_mapping_table,
    with_scalar,
    zip_explode,
)
from dog_data_pipeline_spark.operators.aggregates import (  # noqa: F401
    completeness_filter,
    conditional_frequency_filter,
    grouped_max_pad,
    ordered_collect,
)
from dog_data_pipeline_spark.operators.windows import (  # noqa: F401
    drop_incomplete_windows,
    partition_max,
    tumbling_bucket,
)
from dog_data_pipeline_spark.operators.dead_letter import split_status  # noqa: F401

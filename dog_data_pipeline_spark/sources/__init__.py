"""Sources & sinks (SURVEY §2.1)."""

from dog_data_pipeline_spark.sources.catalog import (  # noqa: F401
    read_catalog_csv,
    write_catalog_atomic,
)
from dog_data_pipeline_spark.sources.json_map import (  # noqa: F401
    read_json_map,
    write_json_map,
)
from dog_data_pipeline_spark.sources.files import (  # noqa: F401
    list_binary_files,
    parse_path_components,
)
from dog_data_pipeline_spark.sources.copy import (  # noqa: F401
    execute_copies,
    plan_copies,
)
from dog_data_pipeline_spark.sources.formats import (  # noqa: F401
    AvroUnavailableError,
    avro_available,
    convert_table,
    read_avro,
    read_orc,
    write_avro,
    write_orc,
)

"""dog_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine exposing the query and data-processing
capabilities of the reference pipeline (``malina-florea/dog-data-pipeline``)
as generic, 100-TB-scalable DataFrame operators, plus the LLM-training-data
operators (dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow).
- ``tables``     — schema-declared loaders for the test star schema.
- ``operators``  — composable ``DataFrame -> DataFrame`` operators
  (relational, aggregates, windows, dedup, similarity, text, dead-letter).
- ``functions``  — column-expression function library (geometry, strings).
- ``sources``    — sources/sinks (csv/json-map/binary-file/catalog).
- ``pipelines``  — named pipelines mirroring the reference's 3 stages.
- ``streaming``  — Structured Streaming variants of the windowed operators.
- ``queries``    — the query registry consumed by ``__spark_entry__.py``.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join planning and AQE; Python UDFs appear only where built-ins genuinely
cannot express the semantics (multimodal decode), and then always as
Arrow-batched Pandas UDFs.
"""

__version__ = "0.1.0"

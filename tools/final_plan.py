"""Dump the FINAL adaptive plan (after execution) for a registry query.

`explain()` before execution shows isFinalPlan=false with no
ReusedExchange markers; this runs the query once (bench checksum) and
prints the executed plan, where AQE's runtime exchange/subquery reuse
is visible — the only way to tell whether a repeated subtree actually
re-executes.

Usage: python tools/final_plan.py <query> [--sf DIR]
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    from bench import _checksum
    from dog_data_pipeline_spark.queries import REGISTRY
    from dog_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        _checksum(df)
        # the checksum wraps df in an agg; df's own execution tree is
        # finalized as a subtree — re-trigger on df itself for clarity
        df.write.format("noop").mode("overwrite").save()
        print(f"===== {name} (executed plan) =====")
        print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()


if __name__ == "__main__":
    main()

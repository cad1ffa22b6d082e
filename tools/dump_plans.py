"""Dump .explain("formatted") for named registry queries to files.

Optimization-round deliverable: plans/r12/<query>_{before,after}.txt.
Runs in ONE fresh session (certificates execute eager setup work while
building their DataFrame, so dumping a plan costs roughly the query's
setup; batching amortizes the session).

Usage: python tools/dump_plans.py --tag before --out plans/r12 q1 q2 ...
       python tools/dump_plans.py --tag after  --out plans/r12 --top 30
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    argv = sys.argv[1:]
    tag, out_dir, sf = "before", "plans/r12", "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--tag":
            tag = argv[i + 1]
            i += 2
        elif argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names:
        sys.exit("no queries named")
    os.makedirs(out_dir, exist_ok=True)

    from dog_data_pipeline_spark.queries import REGISTRY
    from dog_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = spec.fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(path, "w") as fh:
            fh.write(f"# {name} [{tag}] sf_dir={sf}\n")
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

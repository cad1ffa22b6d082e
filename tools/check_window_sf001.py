"""Pre-flight: replicate the driver's sf0.01 oracle gate over the
50-entry priority window (and optionally the whole registry).

Usage: python tools/check_window_sf001.py [--all] [--sf DIR]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle_utils import compare, duckdb_con  # noqa: E402

from dog_data_pipeline_spark.queries import REGISTRY, _PRIORITY_ORDER  # noqa: E402
from dog_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    names = list(_PRIORITY_ORDER)
    if "--all" in sys.argv:
        names = list(REGISTRY)
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
    spark = get_spark()
    con = duckdb_con(sf_dir)
    bad = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"{name}: NO_ORACLE rows={n} ({time.time()-t0:.1f}s)")
                continue
            problems = compare(df, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {e!r}"]
        if problems:
            bad += 1
            print(f"{name}: FAIL ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p[:500]}")
        else:
            print(f"{name}: ok ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - bad}/{len(names)} pass")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Isolated re-timing: run each named registry query in a FRESH JVM
(new spark-submit-equivalent process), min-of-3, to separate bench-
environment variance (GC/heap pressure from neighbors in the shared
147-query session) from real operator drift.

Usage: python tools/retime_isolated.py q1 q2 ... [--sf /root/testdata/sf0.1]
Prints one JSON line {name: min_sec, ...} and, if BENCH_LOCAL_r*.json
exists for the current round, merges the numbers under the
"isolated_retimes" key of the newest artifact.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, os
sys.path.insert(0, {root!r})
from dog_data_pipeline_spark.queries import REGISTRY
from dog_data_pipeline_spark.session import get_spark
from bench import _checksum
spark = get_spark(app_name="retime-isolated")
spark.sparkContext.setLogLevel("ERROR")
# warmup: tables + codegen, outside timing (mirrors bench.py)
from dog_data_pipeline_spark.tables import TABLE_NAMES, load
for t in TABLE_NAMES:
    load(spark, {sf!r}, t).count()
spec = REGISTRY[{name!r}]
best = None
for _ in range(3):
    t0 = time.time()
    _checksum(spec.fn(spark, {sf!r}))
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("RESULT", round(best, 3))
spark.stop()
"""


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            if i + 1 >= len(argv):
                sys.exit("--sf requires a path argument")
            sf = argv[i + 1]
            i += 2
            continue
        if argv[i].startswith("--"):
            sys.exit(f"unknown flag: {argv[i]}")
        args.append(argv[i])
        i += 1
    out: dict[str, float] = {}
    for name in args:
        code = _CHILD.format(root=HERE, sf=sf, name=name)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT")]
        out[name] = float(line[0].split()[1]) if line else -1.0
        sys.stderr.write(f"{name}: {out[name]}\n")
    print(json.dumps(out))
    rounds = {
        int(m.group(1)): f
        for f in os.listdir(HERE)
        if (m := re.fullmatch(r"BENCH_LOCAL_r(\d+)\.json", f))
    }
    if rounds:
        path = os.path.join(HERE, rounds[max(rounds)])
        payload = json.load(open(path))
        payload.setdefault("isolated_retimes", {}).update(out)
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

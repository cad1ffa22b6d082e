"""Interleaved per-query A/B: round-start checkout vs HEAD.

The box's walls swing 35-80% across sessions (every round's records
say so), so HEAD-only spot retimes cannot support a perf claim. This
runner alternates fresh-JVM legs — one process per (leg, round) pinned
to a checkout — and reports per-query min floors per leg.

Usage: python tools/ab_retime.py --other /tmp/r12start [--rounds 3] q1 q2 ...
Prints one JSON line {"other": {...floors}, "head": {...floors}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HEAD_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time, json
sys.path.insert(0, {root!r})
from dog_data_pipeline_spark.queries import REGISTRY
from dog_data_pipeline_spark.session import get_spark
from bench import _checksum
spark = get_spark(app_name="ab-retime")
spark.sparkContext.setLogLevel("ERROR")
from dog_data_pipeline_spark.tables import TABLE_NAMES, load
for t in TABLE_NAMES:
    load(spark, {sf!r}, t).count()
import pandas as pd
from pyspark.sql import functions as F
@F.pandas_udf("long")
def _warm(v):
    return v
spark.range(1000).select(_warm("id")).count()
out = {{}}
for name in {names!r}:
    t0 = time.time()
    _checksum(REGISTRY[name].fn(spark, {sf!r}))
    out[name] = round(time.time() - t0, 3)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_leg(root: str, names: list[str], sf: str) -> dict:
    child = _CHILD.format(root=root, sf=sf, names=names)
    proc = subprocess.run(
        [sys.executable, "-c", child], capture_output=True, text=True,
        cwd="/tmp",
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError(f"leg failed for {root}")


def main() -> None:
    argv = sys.argv[1:]
    other, rounds, sf = None, 3, "/root/testdata/sf0.1"
    head_root = HEAD_ROOT
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--other":
            other = argv[i + 1]
            i += 2
        elif argv[i] == "--head":
            head_root = argv[i + 1]
            i += 2
        elif argv[i] == "--rounds":
            rounds = int(argv[i + 1])
            i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names or other is None:
        sys.exit("usage: ab_retime.py --other DIR [--rounds N] q1 q2 ...")
    floors: dict[str, dict[str, float]] = {"other": {}, "head": {}}
    for rnd in range(rounds):
        order = (("other", other), ("head", head_root))
        if rnd % 2:  # alternate leg order: box drift within a round
            order = order[::-1]  # must not always tax the same leg
        for tag, root in order:
            res = run_leg(root, names, sf)
            for q, t in res.items():
                cur = floors[tag].get(q)
                floors[tag][q] = t if cur is None else min(cur, t)
            sys.stderr.write(f"round {rnd} {tag}: {res}\n")
    print(json.dumps(floors))
    for q in names:
        a, b = floors["other"].get(q), floors["head"].get(q)
        if a and b:
            print(f"{q}: other {a:.2f} head {b:.2f} ratio {b / a:.2f}")


if __name__ == "__main__":
    main()

"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is FULLY evaluated: the timing loop collects
sum(xxhash64(all output columns)), so projection-only queries execute
their real work (a bare count() lets Catalyst prune computed columns —
round 1 benched a crashing query green that way).

Timing is stall-resistant: this box shows intermittent 10-25s
Python-worker scheduling stalls, and a single-run harness bakes them
into the round's numbers (round 1 recorded 14.9s for a 2.2s query).
Each query runs twice; if the runs disagree by >25% a third run decides
the median. The reported time is min of the agreeing runs / median of 3.
Override repeats with SPARK_GRAFT_BENCH_RUNS (min runs, default 2).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dog_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from dog_data_pipeline_spark.session import get_spark  # noqa: E402


def _has_map(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_map(f.dataType) for f in dt.fields)
    return False


def _checksum(df):
    """Full-evaluation checksum: sum of xxhash64 over every output column
    (map-bearing columns via to_json — hash of MapType is unsupported;
    the sum runs in decimal(38,0) because ANSI mode throws on long
    overflow and 64-bit hash sums overflow immediately)."""
    from pyspark.sql import functions as F

    cols = [
        F.to_json(df[f.name]) if _has_map(f.dataType) else df[f.name]
        for f in df.schema.fields
    ]
    return df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("c")
    ).collect()[0][0]


def _time_once(spec, spark, sf_dir: str) -> float:
    t0 = time.time()
    _checksum(spec.fn(spark, sf_dir))
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    base_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

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
        try:
            runs = [_time_once(spec, spark, sf_dir) for _ in range(base_runs)]
            if len(runs) >= 2 and max(runs) > 1.25 * min(runs) + 0.2:
                runs.append(_time_once(spec, spark, sf_dir))
                timings[name] = round(statistics.median(runs), 3)
            else:
                # Two AGREEING slow runs can still both be scheduler
                # stalls (this box stalls 10-25s at a time, and stalls
                # cluster); for any query past 5s spend one more run and
                # keep the min — measured to separate a genuinely-heavy
                # query from back-to-back stalls (e.g. a 2.7s query
                # recorded as 10.0s).
                if min(runs) > 5.0:
                    runs.append(_time_once(spec, spark, sf_dir))
                timings[name] = round(min(runs), 3)
        except Exception as e:  # record failures as negative sentinel
            sys.stderr.write(f"bench: {name} failed: {e}\n")
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(payload))
    # The driver parses a JSON object from the LAST ~2000 chars of
    # stdout (every BENCH_r* artifact stores a 2000-char tail; rounds
    # 1-9, whose final line was the full per-query dict at ~6 KB, all
    # landed "parsed": null because the line's start fell outside that
    # window). The r12 verdict asks for the per-query dict back in the
    # parsed final line — but the full 205-name dict is >=4.8 KB even
    # with zero-width values (the names alone), so it can NEVER fit.
    # Compromise: the final line carries the totals plus a REAL
    # "queries" dict holding the heaviest queries that fit a fixed
    # byte budget (failures first, then greedy by descending wall —
    # the entries that matter for perf comparison), with
    # queries_truncated/n_queries_emitted flagging the omission and a
    # queries_sha256 matching the verbatim full dict printed on the
    # previous line and persisted to BENCH_LOCAL_r{N}.json below.
    import hashlib

    qjson = json.dumps(timings, sort_keys=True)
    compact = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "queries_sha256": hashlib.sha256(qjson.encode()).hexdigest(),
        "queries_truncated": True,
        "n_queries_emitted": 0,
        "queries": {},
    }
    budget = 1850  # proven-safe margin inside the 2000-char tail window
    size = len(json.dumps(compact, sort_keys=True, separators=(",", ":")))
    emitted: dict[str, float] = {}
    # failures first (their NAMES matter, not just n_failed), then
    # heaviest first; greedy so short names can still slot in late
    for name, t in sorted(
        timings.items(), key=lambda kv: (kv[1] >= 0, -kv[1])
    ):
        cost = len(json.dumps({name: round(t, 2)}, separators=(",", ":"))) - 2
        if emitted:
            cost += 1  # joining comma
        if size + cost <= budget:
            emitted[name] = round(t, 2)
            size += cost
    compact["queries"] = emitted
    compact["n_queries_emitted"] = len(emitted)
    compact["queries_truncated"] = len(emitted) < len(timings)
    print(json.dumps(compact, sort_keys=True, separators=(",", ":")))
    # Also persist the full dict into the repo: the driver's BENCH_r{N}
    # artifact has truncated its tail before (round 2 lost queries a-i),
    # so every round keeps a verbatim local copy. N = next round number
    # inferred from the driver's existing BENCH_r*.json files.
    try:
        import re

        if abs(sf_val - 0.1) > 1e-9:
            # iterating runs at other SFs (sf0.01 while developing) must
            # not overwrite the canonical sf0.1 round artifact
            raise OSError(f"non-canonical sf {sf_val}; artifact not written")
        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        n = max(rounds, default=0) + 1
        path = os.path.join(here, f"BENCH_LOCAL_r{n:02d}.json")
        # A re-run must not silently erase the round's side records
        # (isolated re-times, soak-test results, explanatory notes are
        # appended to this file by hand): carry over every key the fresh
        # payload doesn't produce itself. But a carried dict keyed by
        # query name may reference queries renamed/rotated out since the
        # prior run — prune those entries so the artifact never
        # misrepresents the current registry, and stamp what was carried.
        try:
            with open(path) as fh:
                carried = []
                for k, v in json.load(fh).items():
                    if k in payload or k == "carried_keys":
                        continue
                    if isinstance(v, dict) and v and all(
                        isinstance(x, (int, float)) for x in v.values()
                    ):
                        pruned = {q: t for q, t in v.items() if q in REGISTRY}
                        if not pruned:
                            continue
                        v = pruned
                    payload[k] = v
                    carried.append(k)
                if carried:
                    payload["carried_keys"] = sorted(carried)
        except (OSError, ValueError):
            pass
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError as e:  # read-only checkout must not fail the bench
        sys.stderr.write(f"bench: local artifact write skipped: {e}\n")
    spark.stop()


if __name__ == "__main__":
    main()


def run_single(name: str, sf_dir: str = "/root/testdata/sf0.1") -> float:
    """Debug helper: time one registry query (full evaluation) in an
    existing-session-free process."""
    spark = get_spark(app_name="bench-single")
    spark.sparkContext.setLogLevel("ERROR")
    t = _time_once(REGISTRY[name], spark, sf_dir)
    spark.stop()
    return t

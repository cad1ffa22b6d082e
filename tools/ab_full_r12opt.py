"""Full-registry interleaved A/B for the r12 OPTIMIZATION round:
round-start checkout (15114f2, /tmp/r12start) vs HEAD (/root/repo).

Alternating fresh-JVM bench.py legs (leg order flips each round to
cancel within-round box drift), stdout captured per leg; floors are
per-query min over each side's legs. Prints the summary JSON to merge
into BENCH_LOCAL_r12.json under "ab_opt_r12".

Usage: python tools/ab_full_r12opt.py [--rounds 3] [--out /tmp/ab_out12_opt]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

LEGS = {"start": "/tmp/r12start", "head": "/root/repo"}


def run_leg(tag: str, root: str, out_dir: str, rnd: int) -> dict | None:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.1"
    env["SPARK_GRAFT_CPUS"] = "32"
    free = shutil.disk_usage("/tmp").free // 2**30
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=root, env=env,
        capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    path = os.path.join(out_dir, f"{tag}_run{rnd}.out")
    with open(path, "w") as fh:
        fh.write(proc.stdout)
    payload = None
    for ln in proc.stdout.splitlines():
        if ln.startswith("{") and '"queries": {' in ln:
            payload = json.loads(ln)
    sys.stderr.write(
        f"leg {tag} round {rnd}: wall {wall}s, /tmp free {free}G, "
        f"total {payload['value'] if payload else 'FAILED'}\n"
    )
    return payload


def main() -> None:
    rounds, out_dir = 3, "/tmp/ab_out12_opt"
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--rounds":
            rounds = int(argv[i + 1])
            i += 2
        elif argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        else:
            sys.exit(f"unknown arg {argv[i]}")
    os.makedirs(out_dir, exist_ok=True)
    runs: dict[str, list[dict]] = {"start": [], "head": []}
    for rnd in range(rounds):
        order = ["start", "head"] if rnd % 2 == 0 else ["head", "start"]
        for tag in order:
            p = run_leg(tag, LEGS[tag], out_dir, rnd)
            if p:
                runs[tag].append(p)
    common = None
    for legs in runs.values():
        for p in legs:
            qs = {q for q, t in p["queries"].items() if t >= 0}
            common = qs if common is None else common & qs
    common = sorted(common or [])
    floors = {
        tag: {q: min(p["queries"][q] for p in legs) for q in common}
        for tag, legs in runs.items()
        if legs
    }
    ratios = sorted(
        (
            round(floors["head"][q] / max(floors["start"][q], 1e-9), 2),
            q,
            floors["start"][q],
            floors["head"][q],
        )
        for q in common
    )
    summary = {
        "what": (
            "optimization-round interleaved fresh-JVM A/B: round-start "
            "HEAD 15114f2 vs optimized HEAD, full registry, alternating "
            "leg order per round, per-query min-of-%d floors" % rounds
        ),
        "n_common": len(common),
        "per_run_totals": {
            tag: [round(sum(p["queries"][q] for q in common), 1) for p in legs]
            for tag, legs in runs.items()
        },
        "min_common_total": {
            tag: round(sum(f.values()), 1) for tag, f in floors.items()
        },
        "n_regressed_2x": sum(1 for r, *_ in ratios[::-1] if r >= 2.0),
        "worst": [
            {"query": q, "start_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[-8:][::-1]
        ],
        "best": [
            {"query": q, "start_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[:8]
        ],
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

"""Window-rotation planner: compute the next round's 50-slot driver
window from the recorded CORRECTNESS_r*.json history instead of
hand-picking it.

With ~200 registry queries and a 50-slot per-round driver window, full
re-certification cadence is ~4 rounds; each round's `_PRIORITY_ORDER`
should hold (a) the flagship, (b) every never-driver-checked query
(new this round — the freeze-then-build rule says they MUST take a
slot in the same commit that lands them), and (c) the stalest-
certified tail, oldest driver row first. This tool computes exactly
that and prints it as a ready-to-paste python list, so the rotation is
derived from the artifacts, not from memory.

Usage:
  python tools/window_rotation.py            # plan the next window
  python tools/window_rotation.py --stale 20 # just the 20 stalest
  python tools/window_rotation.py --check    # verify _PRIORITY_ORDER
                                             #   covers all never-checked
Exit status for --check: non-zero if a registry query has no driver
row AND no slot in the current window (a freeze-then-build violation).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

WINDOW = 50


def latest_green_round() -> dict[str, int]:
    """name -> newest round with a driver row (green or not: the driver
    writes a row per attempted query; a red row still counts as
    'checked' for rotation, and shows up loudly elsewhere)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            for name in json.load(fh):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def plan(registry_names: list[str], flagship: str) -> tuple[list[str], list[str]]:
    """-> (window, deferred): window = flagship + never-checked (in
    registry definition order) + stalest tail (oldest round first,
    name-alphabetical within a round for determinism); deferred = the
    certified-but-stale names that did not fit this round."""
    latest = latest_green_round()
    never = [n for n in registry_names if n != flagship and n not in latest]
    window = [flagship] + never
    stale = sorted(
        (n for n in registry_names if n in latest and n != flagship),
        key=lambda n: (latest[n], n),
    )
    free = WINDOW - len(window)
    if free < 0:
        raise SystemExit(
            f"{len(never)} never-checked queries exceed the window; "
            "land fewer queries per round"
        )
    return window + stale[:free], stale[free:]


def main() -> int:
    from dog_data_pipeline_spark.queries import REGISTRY, _PRIORITY_ORDER

    names = list(REGISTRY)
    latest = latest_green_round()
    if "--stale" in sys.argv:
        n = int(sys.argv[sys.argv.index("--stale") + 1])
        stale = sorted(
            (q for q in names if q in latest), key=lambda q: (latest[q], q)
        )
        for q in stale[:n]:
            print(f"r{latest[q]}  {q}")
        return 0
    if "--check" in sys.argv:
        missing = [
            q for q in names if q not in latest and q not in _PRIORITY_ORDER
        ]
        for q in missing:
            print(f"NEVER-CHECKED and NOT IN WINDOW: {q}")
        print(f"registry={len(names)} window={len(_PRIORITY_ORDER)} "
              f"never-checked-outside-window={len(missing)}")
        return 1 if missing else 0

    window, deferred = plan(names, "flagship_segment_stats")
    print("_PRIORITY_ORDER = [")
    for q in window:
        tag = f"r{latest[q]}" if q in latest else "NEW"
        print(f'    "{q}",  # {tag}')
    print("]")
    if deferred:
        print(f"# deferred to next round ({len(deferred)}):")
        for q in deferred:
            print(f"#   r{latest[q]}  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

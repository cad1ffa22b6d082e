"""Round-11 interleaved A/B: r10-HEAD vs r11-HEAD per-query floors
(verdict r10 asks #6 and #7).

Convention (established r10, `BENCH_LOCAL_r10.json` "conventions"):
round-over-round perf claims are made on interleaved fresh-JVM
min-of-N per-query floors over a named common set, never on the
driver's canonical single-run day. Ask #7 additionally requires the
common set to be the FULL registry minus genuinely-new-in-r11 (the
four certificates added since r8 had no cross-round floor history in
the r10 A/B's common-197 set; here they do).

Reads /tmp/ab_out/{r10,head}_run*.out produced by the interleaved
runner (alternating legs, fresh bench.py process = fresh JVM each,
/tmp headroom logged per leg) and reduces to per-leg min floors over
the common query set, worst per-query ratios, and the >=2x regression
count the ask gates on.

Usage: python tools/ab_r11.py [/tmp/ab_out]
Merge the printed JSON into BENCH_LOCAL_r11.json under
"ab_interleaved_r11".
"""

from __future__ import annotations

import glob
import json
import os
import sys


def runs_for(tag: str, base: str) -> list[dict]:
    out = []
    for path in sorted(glob.glob(os.path.join(base, f"{tag}_run*.out"))):
        payloads = [
            json.loads(ln)
            for ln in open(path)
            if ln.startswith("{") and '"queries": {' in ln
        ]
        if payloads:
            out.append(payloads[-1])
    return out


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_out"
    legs = {tag: runs_for(tag, base) for tag in ("r10", "head")}
    common = None
    for runs in legs.values():
        for p in runs:
            qs = {q for q, t in p["queries"].items() if t >= 0}
            common = qs if common is None else common & qs
    common = sorted(common or [])
    all_head = sorted(
        {q for p in legs.get("head", []) for q in p["queries"]}
    )
    floors = {
        tag: {q: min(p["queries"][q] for p in runs) for q in common}
        for tag, runs in legs.items()
        if runs
    }
    summary = {
        "n_common": len(common),
        "new_in_r11_excluded": sorted(set(all_head) - set(common)),
        "per_run_totals": {
            tag: [round(sum(p["queries"][q] for q in common), 1) for p in runs]
            for tag, runs in legs.items()
        },
        "min_common_total": {
            tag: round(sum(f.values()), 1) for tag, f in floors.items()
        },
    }
    if "r10" in floors and "head" in floors:
        ratios = sorted(
            (
                (
                    round(floors["head"][q] / max(floors["r10"][q], 1e-9), 2),
                    q,
                    floors["r10"][q],
                    floors["head"][q],
                )
                for q in common
                if floors["r10"][q] >= 0.2  # sub-200ms floors are all noise
            ),
            reverse=True,
        )
        summary["worst_head_over_r10"] = [
            {"query": q, "r10_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[:10]
        ]
        summary["best_head_over_r10"] = [
            {"query": q, "r10_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[-5:]
        ]
        summary["n_regressed_2x"] = sum(1 for r, *_ in ratios if r >= 2.0)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

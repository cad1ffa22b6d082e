"""Round-10 drift attribution: summarize the interleaved r8/r9/HEAD
bench A/B (verdict r9 ask #2).

Round 9 recorded a +20% common-197 drift (161.4s r8 -> 194.1s r9) on a
box whose identical-code A/B swung 2x on one write stage; attribution
to box noise was plausible but unsettled. This tool reads the
interleaved outputs produced by /tmp/ab_out/run_ab.sh — three rounds of
(r8-HEAD, r9-HEAD, r10-HEAD) full bench runs, fresh JVM each, /tmp
headroom verified at each start — and reduces them to the one
comparison that settles it: per-leg MIN totals over the SAME
common-query set, plus the per-query worst ratios between legs' mins.

Usage: python tools/ab_r10.py [/tmp/ab_out]
Prints a JSON summary; merge the result into BENCH_LOCAL_r10.json
under "ab_interleaved_r10" (one bookkeeping convention: every
cross-round sum in that artifact is computed over the named common
set from each leg's min-of-N per-query floors).
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
    legs = {tag: runs_for(tag, base) for tag in ("r8", "r9", "head")}
    common = None
    for runs in legs.values():
        for p in runs:
            qs = {q for q, t in p["queries"].items() if t >= 0}
            common = qs if common is None else common & qs
    common = sorted(common or [])
    floors = {
        tag: {
            q: min(p["queries"][q] for p in runs)
            for q in common
        }
        for tag, runs in legs.items()
        if runs
    }
    summary = {
        "n_common": len(common),
        "per_run_totals": {
            tag: [round(sum(p["queries"][q] for q in common), 1) for p in runs]
            for tag, runs in legs.items()
        },
        "min_common_total": {
            tag: round(sum(f.values()), 1) for tag, f in floors.items()
        },
    }
    if "r8" in floors and "r9" in floors:
        ratios = sorted(
            (
                (round(floors["r9"][q] / max(floors["r8"][q], 1e-9), 2), q,
                 floors["r8"][q], floors["r9"][q])
                for q in common
                if floors["r8"][q] >= 0.2  # sub-200ms floors are all noise
            ),
            reverse=True,
        )
        summary["worst_r9_over_r8"] = [
            {"query": q, "r8_min": a, "r9_min": b, "ratio": r}
            for r, q, a, b in ratios[:10]
        ]
        summary["n_regressed_2x"] = sum(1 for r, *_ in ratios if r >= 2.0)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

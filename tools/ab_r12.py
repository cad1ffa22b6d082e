"""Round-12 interleaved A/B: r11-HEAD vs r12-HEAD per-query floors
(verdict r11 ask #6, convention established r10).

Round-over-round perf claims are made on interleaved fresh-JVM
min-of-N per-query floors over a named common set, never on the
driver's canonical single-run day (this box's walls swing ±35-80%
across sessions). The common set is the FULL registry minus
genuinely-new-in-r12 (knn_ivf_index_filtered — no r11 floor exists
for it by construction).

Reads /tmp/ab_out12/{r11,head}_run*.out produced by the interleaved
runner (alternating legs, fresh bench.py process = fresh JVM each,
/tmp headroom logged per leg) and reduces to per-leg min floors over
the common query set, worst per-query ratios, and the >=2x regression
count the ask gates on.

Usage: python tools/ab_r12.py [/tmp/ab_out12]
Merge the printed JSON into BENCH_LOCAL_r12.json under
"ab_interleaved_r12".
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
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_out12"
    legs = {tag: runs_for(tag, base) for tag in ("r11", "head")}
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
        "new_in_r12_excluded": sorted(set(all_head) - set(common)),
        "per_run_totals": {
            tag: [round(sum(p["queries"][q] for q in common), 1) for p in runs]
            for tag, runs in legs.items()
        },
        "min_common_total": {
            tag: round(sum(f.values()), 1) for tag, f in floors.items()
        },
    }
    if "r11" in floors and "head" in floors:
        ratios = sorted(
            (
                (
                    round(floors["head"][q] / max(floors["r11"][q], 1e-9), 2),
                    q,
                    floors["r11"][q],
                    floors["head"][q],
                )
                for q in common
                if floors["r11"][q] >= 0.2  # sub-200ms floors are all noise
            ),
            reverse=True,
        )
        summary["worst_head_over_r11"] = [
            {"query": q, "r11_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[:10]
        ]
        summary["best_head_over_r11"] = [
            {"query": q, "r11_min": a, "head_min": b, "ratio": r}
            for r, q, a, b in ratios[-8:]
        ]
        summary["n_regressed_2x"] = sum(1 for r, *_ in ratios if r >= 2.0)
        trimmed = [
            "stream_ivf_ingest",
            "stream_sliding_session_windows",
            "ivf_upsert_delete",
            "stateful_stream_tracks",
            "knn_ivf_index_opq",
        ]
        summary["trimmed_certificates"] = {
            q: {
                "r11_min": floors["r11"].get(q),
                "head_min": floors["head"].get(q),
                "delta_pct": round(
                    100.0
                    * (floors["head"][q] - floors["r11"][q])
                    / floors["r11"][q],
                    1,
                )
                if q in floors["r11"] and floors["r11"][q]
                else None,
            }
            for q in trimmed
            if q in floors.get("head", {})
        }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

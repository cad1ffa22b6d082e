"""Round-10 scale soak: PER-CELL compaction vs the full-index rewrite
it replaced, at 8M rows / 256 lists.

Advisor r9 flagged that ``ivf_compact`` paid a full-corpus
scan+shuffle+write when a single hot cell fragmented; r10 rewrote it
to recluster ONLY the over-threshold cells (partition-pruned scan)
and hard-link the cold cells' files into the new generation. This leg
measures both walls ON THE SAME fragmented index, interleaved
(memory: this box's build/write walls swing +-80% across sessions —
only same-session interleaved comparisons count):

- leg A: the shipped per-cell ``ivf_compact`` (1 hot cell rewritten,
  ~255 cold cells hard-linked), min of N reps on hardlink clones.
- leg B: the old implementation's core cost — recluster + rewrite the
  ENTIRE index through the same ``_cell_salted`` pipeline to a
  scratch dir (exactly what pre-r10 ``ivf_compact`` executed), min of
  N reps.

Usage: python tools/soak_r10.py [reps]
Merges ``ivf_percell_compact_8m_r10`` into BENCH_LOCAL_r10.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from dog_data_pipeline_spark.session import get_spark  # noqa: E402
from dog_data_pipeline_spark.operators.similarity import (  # noqa: E402
    _cell_salted,
    build_ivf_index,
    ivf_append,
    ivf_compact,
    ivf_index_dir,
)
from tools.soak_r8 import gen_vectors, t  # noqa: E402

ARTIFACT = os.path.join(HERE, "BENCH_LOCAL_r10.json")
BASE = "/tmp/soak_r10_vec"


def merge(records: dict) -> None:
    art: dict = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            art = json.load(fh)
    art.update(records)
    tmp = ARTIFACT + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    os.replace(tmp, ARTIFACT)
    print(f"merged {sorted(records)} into {ARTIFACT}", flush=True)


def n_files(index_dir: str) -> int:
    return sum(
        1
        for d in os.listdir(index_dir)
        if d.startswith("cell=")
        for f in os.listdir(os.path.join(index_dir, d))
        if f.endswith(".parquet")
    )


def opq_recall_leg(spark) -> None:
    """Leg 2: OPQ vs plain PQ at 2M rows, codes-only serving.

    PQ's weakness is correlated dimensions — the per-subspace codebooks
    waste budget re-encoding shared variance. Real embedding models
    produce exactly that, so the corpus here is the synthetic cluster
    family pushed through a fixed anisotropic mix (decaying per-dim
    scale then an orthogonal rotation, applied via one Arrow
    mapInPandas pass): every output dim mixes all scales, the
    within-cell residuals are strongly correlated, and the measurement
    is the two indexes' codes-only (rerank=0) recall@10 against the
    exact top-10 — same corpus, same coarse quantizer seed, same 8
    bytes/code, the ONLY difference being the sidecar rotation."""
    import numpy as np

    from pyspark.sql import functions as F
    from dog_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        query_ivf_index,
    )

    rec: dict = {"n_rows": 2_000_000, "n_lists": 64, "ksub": 256}
    base_p = f"{BASE}/corpus2m_base"
    rec["datagen_sec"] = gen_vectors(spark, base_p, 2_000_000)
    rng = np.random.RandomState(11)
    q_mix, _ = np.linalg.qr(rng.randn(64, 64))
    mix = (np.diag(1.35 ** -np.arange(64)) @ q_mix).astype(np.float64)

    corr_p = f"{BASE}/corpus2m_corr"
    if not os.path.exists(os.path.join(corr_p, "_SUCCESS")):
        def _apply_mix(batches):
            import pandas as pd

            for pdf in batches:
                x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "embedding": list((x @ mix)),
                    }
                )

        t0 = time.time()
        (
            spark.read.parquet(base_p)
            .mapInPandas(_apply_mix, "vec_id long, embedding array<double>")
            .write.mode("overwrite")
            .parquet(corr_p)
        )
        rec["mix_sec"] = round(time.time() - t0, 2)
    corpus = spark.read.parquet(corr_p)

    queries = corpus.filter(F.col("vec_id") % 31_337 == 7).limit(64).persist()
    rec["n_queries"] = queries.count()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(
            corpus, queries, k=10, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    # both code budgets: 8 B/vec (the compressed extreme, where the
    # rotation matters most) and 16 B/vec (= dim/4, the documented
    # default operating point)
    for m_sub in (8, 16):
        for tag, opq in (("pq", False), ("opq", True)):
            idx = f"{BASE}/ivf2m_{tag}{m_sub}"
            if os.path.exists(idx):
                shutil.rmtree(idx)
            dt, _ = t(
                lambda: build_ivf_index(
                    corpus, idx, n_lists=64, seed=42, pq_m_sub=m_sub,
                    pq_ksub=256, pq_opq=opq,
                )
            )
            rec[f"build_{tag}{m_sub}_sec"] = round(dt, 2)
            got = {
                (r["query_id"], r["vec_id"])
                for r in query_ivf_index(
                    spark, idx, queries, k=10, n_probe=16, rerank=0
                ).collect()
            }
            rec[f"recall10_{tag}_m{m_sub}"] = round(
                len(got & exact) / max(len(exact), 1), 4
            )
            shutil.rmtree(idx, ignore_errors=True)
    queries.unpersist()
    rec["note"] = (
        "Codes-only recall@10 (rerank=0, n_probe=16/64) at 8 and 16 "
        "bytes/vector "
        "on a 2M anisotropic-mixed corpus: identical coarse quantizer "
        "and code budget, the only delta is the OPQ sidecar rotation. "
        "Exact serving (rerank>=1) is unaffected either way — the "
        "rotation moves the ADC shortlist quality, which is what "
        "codes-only serving exposes."
    )
    merge({"ivf_opq_recall_2m_r10": rec})


def main() -> None:
    args = sys.argv[1:]
    os.makedirs(BASE, exist_ok=True)
    spark = get_spark(app_name="soak-r10")
    spark.sparkContext.setLogLevel("ERROR")
    if args and args[0] == "opq":
        opq_recall_leg(spark)
        spark.stop()
        return
    reps = int(args[0]) if args else 2

    rec: dict = {"n_rows": 8_000_000, "n_lists": 256, "reps": reps}
    corpus_p = f"{BASE}/corpus8m"
    rec["datagen_sec"] = gen_vectors(spark, corpus_p, 8_000_000)
    corpus = spark.read.parquet(corpus_p)

    idx = f"{BASE}/ivf_8m"
    if os.path.exists(idx):
        shutil.rmtree(idx)
    rec["build_sec"], _ = t(
        lambda: build_ivf_index(corpus, idx, n_lists=256, seed=42)
    )

    # fragment ONE cell: 12 small appends of near-identical vectors
    # (copies of one corpus row with fresh ids -> same cell every time)
    row = corpus.filter(F.col("vec_id") == 0).collect()[0]
    vec = [float(x) for x in row["embedding"]]
    hot = spark.createDataFrame(
        [(10_000_000 + i, vec) for i in range(2_000)],
        "vec_id long, embedding array<double>",
    ).persist()
    hot.count()
    n_appends = 12
    dt_total = 0.0
    for k in range(n_appends):
        shifted = hot.select(
            (F.col("vec_id") + k * 10_000).alias("vec_id"), "embedding"
        )
        dt, _ = t(lambda: ivf_append(shifted, idx))
        dt_total += dt
    hot.unpersist()
    rec["frag_appends"] = n_appends
    rec["frag_append_total_sec"] = round(dt_total, 2)
    live = ivf_index_dir(idx)
    rec["files_fragmented"] = n_files(live)

    with open(os.path.join(idx, "ivf_meta.json")) as fh:
        meta = json.load(fh)

    # interleaved A/B, reps x (per-cell on a clone, full rewrite)
    percell, fullrw = [], []
    for r in range(reps):
        clone = f"{BASE}/ivf_8m_clone{r}"
        if os.path.exists(clone):
            shutil.rmtree(clone)
        # hardlink clone: same data files, instant, no extra bytes
        subprocess.run(["cp", "-al", idx, clone], check=True)
        dt, stats = t(lambda: ivf_compact(spark, clone))
        percell.append(round(dt, 2))
        if r == 0:
            rec["percell_stats"] = {
                k: stats[k]
                for k in (
                    "cells_over_threshold",
                    "cells_rewritten",
                    "cells_linked",
                    "files_before",
                    "files_after",
                )
            }
            rec["files_compacted"] = n_files(ivf_index_dir(clone))
        shutil.rmtree(clone, ignore_errors=True)

        # old implementation's core: recluster + rewrite EVERY cell
        scratch = f"{BASE}/full_rewrite{r}"
        if os.path.exists(scratch):
            shutil.rmtree(scratch)
        counts = {
            int(k): int(v) for k, v in meta.get("cell_counts", {}).items()
        }
        salts = [
            (cell, max(1, round(n / 250_000))) for cell, n in counts.items()
        ]

        def full_rewrite():
            df = spark.read.parquet(live)
            clustered = _cell_salted(spark, df, meta["id_col"], salts)
            (
                clustered.write.mode("overwrite")
                .partitionBy("cell")
                .parquet(scratch)
            )

        dt, _ = t(full_rewrite)
        fullrw.append(round(dt, 2))
        shutil.rmtree(scratch, ignore_errors=True)

    rec["percell_compact_sec_runs"] = percell
    rec["full_rewrite_sec_runs"] = fullrw
    rec["percell_compact_sec"] = min(percell)
    rec["full_rewrite_sec"] = min(fullrw)
    rec["speedup"] = round(min(fullrw) / max(min(percell), 1e-9), 1)
    rec["note"] = (
        "Per-cell compaction (r10) vs the full-index rewrite it "
        "replaced (pre-r10 ivf_compact core), same 8M/256-list index "
        "fragmented in one hot cell, interleaved same-session min-of-"
        f"{reps}. The per-cell path scans/rewrites only the hot "
        "cell's rows (partition-pruned) and hard-links the other "
        "~255 cells' files into the new generation; the old path "
        "re-shuffled all 8M rows. At 100 TB the gap scales with "
        "corpus/hot-cell ratio: compacting a hot cell stays O(cell), "
        "not O(corpus)."
    )
    merge({"ivf_percell_compact_8m_r10": rec})
    spark.stop()


if __name__ == "__main__":
    main()

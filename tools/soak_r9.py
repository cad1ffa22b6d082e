"""Round-9 scale soaks (run ALONE — no concurrent Spark jobs):

1. SERVING-ONLY WARM-QUERY LAW (r8 verdict ask #3): the r7/r8 warm-query
   numbers were "dominated by the certificate's query-side corpus scan
   rather than the probed index bytes" (the records' own caveat) — the
   query set was `corpus.filter(vec_id < 5)`, a full corpus scan per
   query batch. Re-measure the 2M/8M/32M legs with PRE-MATERIALIZED
   query vectors (a 64-row local DataFrame, zero corpus I/O at query
   time) so "query cost tracks probed bytes" is directly evidenced.
   Probed bytes are measured from parquet column-chunk metadata
   (compressed sizes of the columns the probe projection reads, summed
   over the probed cell directories) — the exact bytes the pruned scan
   moves, not an estimate.

2. DEFAULT-BALANCED LAW POINT (r8 verdict ask #1, evidence leg): the
   builds below run through build_ivf_index's NEW default
   (balance_bound=4.0), so the 8M point that previously recorded
   natural skew 5.12 > skew_bound on a fresh healthy build re-records
   with skew under the guard — the pytest pins the behavior at sf0.001,
   this records it at scale.

3. PERSISTED PQ/ADC SERVING PATH (r8 verdict ask #2, measurement leg):
   at 8M x dim-64, build the corpus with RESIDUAL pq codes at m_sub=8
   and m_sub=16 (64x / 32x smaller candidate payload) and compare
   warm-query wall + probed bytes for ADC-only / ADC+exact-rerank /
   raw at identical probe geometry, plus top-10 recall of PLANTED
   strong neighbors (0.1-cosine margin) through each path and at
   rerank 4 vs 16 — the compression-vs-recall dial, measured.

Results merge into BENCH_LOCAL_r09.json (bench.py carries soak keys
across its own rewrite).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dog_data_pipeline_spark.session import get_spark  # noqa: E402
from dog_data_pipeline_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    ivf_append,
    query_ivf_index,
)
from tools.soak_r8 import gen_vectors, min3, t  # noqa: E402

ARTIFACT = os.path.join(HERE, "BENCH_LOCAL_r09.json")
BASE = "/tmp/soak_r9_vec"


def merge(records: dict) -> None:
    art: dict = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as fh:
            art = json.load(fh)
    art.update(records)
    art["carried_keys"] = sorted(set(art.get("carried_keys", [])) | set(records))
    tmp = ARTIFACT + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    os.replace(tmp, ARTIFACT)
    print(f"merged {sorted(records)} into {ARTIFACT}", flush=True)


def local_queries(spark, corpus, n_queries: int = 64):
    """Pre-materialized query set: collect n vectors ONCE to the driver
    and rebuild them as a local DataFrame — the warm-query timing then
    contains zero corpus I/O, only the probe (the r8 records' caveat,
    removed)."""
    rows = (
        corpus.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    return spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows],
        "vec_id long, embedding array<double>",
    )


def probed_cells(meta: dict, queries_np: "np.ndarray", n_probe: int) -> set[int]:
    """Driver-side mirror of _nearest_cells for the measurement: the
    union of each query's n_probe nearest centroid ids."""
    mat = np.asarray(meta["centroids"], dtype=np.float64)
    out: set[int] = set()
    for v in queries_np:
        d = ((mat - v[None, :]) ** 2).sum(axis=1)
        out.update(int(c) for c in np.argsort(d, kind="stable")[:n_probe])
    return out


def column_bytes(index_path: str, cells: set[int], columns: set[str]) -> int:
    """EXACT probed bytes: sum of parquet column-chunk compressed sizes
    for `columns` across every file of the probed cell directories —
    what the column-pruned, partition-pruned scan actually moves."""
    import pyarrow.parquet as pq

    total = 0
    for cell in cells:
        for f in glob.glob(os.path.join(index_path, f"cell={cell}", "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema.split(".")[0] in columns:
                        total += col.total_compressed_size
    return total


def serving_latency(spark, n_queries: int = 8) -> dict:
    """Leg 1+2: the 3-point serving-only law through the default
    (balanced) build path.

    Query-batch size matters to the MEASUREMENT, not the operator: the
    first r9 run used 64 queries, whose probed-cell UNION covered every
    cell at every scale (64 x n_probe >> n_lists), so 'probed bytes'
    degenerated to the whole index. 8 queries keep the union a real
    fraction (<= 8 x n_probe of n_lists cells) AND the record carries
    scored_pairs = sum over probed cells of cell_rows x queries probing
    that cell — the candidate-stage work the wall actually tracks."""
    rec: dict = {"points": {}}
    warmed = False
    for n, n_lists, n_probe, tag in (
        (2_000_000, 64, 4, "2m"),
        (8_000_000, 256, 16, "8m"),
        (32_000_000, 512, 32, "32m"),
    ):
        corpus_p = f"{BASE}/corpus{tag}"
        pt: dict = {}
        pt["datagen_sec"] = gen_vectors(spark, corpus_p, n)
        corpus = spark.read.parquet(corpus_p)
        idx = f"{BASE}/ivf_{tag}"
        if os.path.exists(os.path.join(idx, "ivf_meta.json")):
            # reuse the built index (the default-balanced build from the
            # first pass); build_sec then reports the recorded layout
            with open(os.path.join(idx, "ivf_meta.json")) as fh:
                meta = json.load(fh)
            pt["build_sec"] = None
        else:
            pt["build_sec"], meta = t(
                lambda: build_ivf_index(corpus, idx, n_lists=n_lists, seed=42)
            )
        counts = {int(k): int(v) for k, v in meta["cell_counts"].items()}
        pt["skew_after_default_build"] = round(
            max(counts.values())
            / (sum(counts.values()) / len(meta["centroids"])),
            3,
        )
        pt["effective_lists"] = meta["effective_lists"]
        qs = local_queries(spark, corpus, n_queries)
        qs_np = np.asarray(
            [r["embedding"] for r in qs.collect()], dtype=np.float64
        )
        if not warmed:
            # shed session codegen/Arrow warmup OUTSIDE the first timed
            # leg (the first r9 pass recorded the 2M wall ABOVE the 8M
            # one for a third of its scored pairs — first-leg warmup)
            query_ivf_index(spark, idx, qs, k=10, n_probe=n_probe).count()
            warmed = True
        pt["warm_query_serving_only_sec"] = min3(
            lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=n_probe).count()
        )
        mat = np.asarray(meta["centroids"], dtype=np.float64)
        per_query = [
            [int(c) for c in np.argsort(((mat - v[None, :]) ** 2).sum(axis=1),
                                        kind="stable")[:n_probe]]
            for v in qs_np
        ]
        cells = {c for cs in per_query for c in cs}
        pt["probed_cells"] = len(cells)
        pt["probed_fraction_rows"] = round(
            sum(counts.get(c, 0) for c in cells) / max(sum(counts.values()), 1),
            4,
        )
        pt["scored_pairs"] = int(
            sum(counts.get(c, 0) for cs in per_query for c in cs)
        )
        pt["probed_bytes_raw_path"] = column_bytes(
            os.path.join(idx, "index"),
            cells,
            {meta["id_col"], meta["vec_col"], "norm"},
        )
        rec["points"][tag] = pt
    rec["note"] = (
        "Serving-only warm-query law (r8 ask #3): 8 pre-materialized "
        "local query vectors, zero corpus I/O in the timed leg; probed "
        "bytes are exact column-chunk compressed sizes over the probed "
        "cell dirs, scored_pairs the candidate-stage row work. Builds "
        "run the r9 DEFAULT balance_bound=4.0 path (r8 ask #1): "
        "skew_after_default_build sits under the drift guard's 4.0 at "
        "every scale (the 8M point recorded 5.12 through the old plain "
        "path). Per-query probed fraction held at 6.25% "
        "(n_probe/n_lists = 4/64, 16/256, 32/512). build_sec: null "
        "means the leg reused the index built by the first r9 pass "
        "(those build walls carried a disk-pressure confound — two "
        "concurrent 16GB datasets filling /tmp; the clean write A/B "
        "measured the r9 salt expression at parity with r8's, see "
        "ivf_build_salt_ab_r9)."
    )
    return rec


def pq_serving_8m(spark) -> dict:
    """Leg 3: raw vs ADC serving at 8M/256, at TWO code sizes (the
    compression-vs-recall dial): m_sub=8 (1 bit/dim, ~64x smaller
    candidate payload) and m_sub=16 (2 bits/dim, ~32x). Residual
    encoding throughout (IVFADC proper) — the first r9 pass measured
    raw-vector codes unusable (planted recall 0.0) and residual m=8
    partial (0.36): at 8 bytes the per-subspace quantizer covers an
    8-dim residual with 256 codewords, whose covering radius is still
    comparable to a 0.1-cosine planted margin; halving dsub quadruples
    effective resolution per byte."""
    corpus_p = f"{BASE}/corpus8m"
    rec: dict = {}
    rec["datagen_sec"] = gen_vectors(spark, corpus_p, 8_000_000)
    corpus = spark.read.parquet(corpus_p)
    qs = local_queries(spark, corpus, 8)
    qs_np = np.asarray([r["embedding"] for r in qs.collect()], dtype=np.float64)
    q_ids = [int(r["vec_id"]) for r in qs.collect()]

    # planted strong neighbors — the regime PQ serving exists for. The
    # synthetic corpus's within-cluster top-10 is decided by noise
    # smaller than any byte-scale code resolution (cluster-mates all
    # sit at cosine ~0.9 +- 1e-3), so top-10 agreement on NATURAL ties
    # measures the corpus, not the operator; the planted set has a
    # ~0.1-cosine margin (cosine ~0.9999 vs ~0.9) — separable
    # structure, the dedup/retrieval use case.
    rng = np.random.RandomState(11)
    planted_rows = []
    planted_by_q: dict[int, set[int]] = {}
    for qi, (qid, v) in enumerate(zip(q_ids, qs_np)):
        ids = set()
        for j in range(20):
            pid = 10**9 + qi * 100 + j
            ids.add(pid)
            vec = v + 0.01 * rng.standard_normal(len(v))
            planted_rows.append((pid, [float(x) for x in vec]))
        planted_by_q[qid] = ids
    planted_df = spark.createDataFrame(
        planted_rows, "vec_id long, embedding array<double>"
    )

    def planted_recall(rows) -> float:
        hits = sum(
            1 for r in rows if r["vec_id"] in planted_by_q.get(r["query_id"], ())
        )
        return round(hits / (len(q_ids) * 10), 4)

    rec["variants"] = {}
    for m_sub in (8, 16):
        var: dict = {}
        pq_idx = f"{BASE}/ivf_8m_pq_m{m_sub}"
        if os.path.exists(pq_idx):
            shutil.rmtree(pq_idx)
        var["build_pq_sec"], meta = t(
            lambda: build_ivf_index(
                corpus, pq_idx, n_lists=256, seed=42,
                pq_m_sub=m_sub, pq_ksub=256,
            )
        )
        cells = probed_cells(meta, qs_np, 16)
        var["probed_cells"] = len(cells)
        var["probed_bytes_raw_path"] = column_bytes(
            os.path.join(pq_idx, "index"), cells, {"vec_id", "embedding", "norm"}
        )
        var["probed_bytes_adc_only"] = column_bytes(
            os.path.join(pq_idx, "index"), cells, {"vec_id", "pq_codes", "norm"}
        )
        # honest accounting: with rerank >= 1 the survivor fetch
        # re-decodes the probed vector column once per query BATCH
        # (broadcast join filters post-scan; parquet has no point
        # lookups) — the exact path's batch cost is adc_only + raw
        # bytes while its MARGINAL per-query cost is the ADC stage's
        var["rerank_fetch_bytes_per_batch"] = var["probed_bytes_raw_path"]
        var["adc_candidate_bytes_ratio"] = round(
            var["probed_bytes_raw_path"] / max(var["probed_bytes_adc_only"], 1), 2
        )
        var["warm_query_raw_sec"] = min3(
            lambda: query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, use_pq=False
            ).count()
        )
        var["warm_query_adc_rerank4_sec"] = min3(
            lambda: query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, rerank=4
            ).count()
        )
        var["warm_query_adc_only_sec"] = min3(
            lambda: query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, rerank=0
            ).count()
        )
        raw_rows = {
            (r["query_id"], r["vec_id"])
            for r in query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, use_pq=False
            ).collect()
        }
        adc_rows = {
            (r["query_id"], r["vec_id"])
            for r in query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, rerank=4
            ).collect()
        }
        var["top10_agreement_vs_raw_natural_ties"] = round(
            len(raw_rows & adc_rows) / max(len(raw_rows), 1), 4
        )
        var["planted_append_sec"], _ = t(lambda: ivf_append(planted_df, pq_idx))
        var["planted_recall10_adc_rerank4"] = planted_recall(
            query_ivf_index(spark, pq_idx, qs, k=10, n_probe=16, rerank=4).collect()
        )
        var["planted_recall10_adc_rerank16"] = planted_recall(
            query_ivf_index(spark, pq_idx, qs, k=10, n_probe=16, rerank=16).collect()
        )
        var["planted_recall10_raw"] = planted_recall(
            query_ivf_index(
                spark, pq_idx, qs, k=10, n_probe=16, use_pq=False
            ).collect()
        )
        rec["variants"][f"m{m_sub}"] = var
    rec["note"] = (
        "Persisted IVF+PQ serving at 8M x dim-64, n_lists=256, "
        "n_probe=16, ksub=256, RESIDUAL codes (IVFADC): probed bytes "
        "from column-chunk metadata over the same probed cells — "
        "ADC-only reads (id, norm, pq_codes), raw reads (id, norm, "
        "embedding); rerank>=1 additionally re-decodes the probed "
        "vector column once per query BATCH (amortized; "
        "rerank_fetch_bytes_per_batch records it, the query_ivf_index "
        "docstring owns the claim). Two code sizes record the "
        "compression-vs-recall dial on PLANTED strong neighbors "
        "(0.1-cosine margin; natural within-cluster ties at ~1e-3 "
        "spread sit below byte-scale code resolution by construction, "
        "so the natural-tie agreement row measures the corpus, not the "
        "operator). rerank 4 vs 16 shows the recall knob at fixed "
        "bytes."
    )
    return rec


def pq_serving_32m(spark) -> dict:
    """Leg 4: the ADC story at the scale it exists for. The r8 32M
    record's caveat was 'warm queries are scan-dominated by probed raw
    bytes' — this builds the 32M index WITH residual codes at the
    recommended m_sub=dim/4=16 and measures raw vs ADC-only vs
    ADC+exact-rerank at n_lists=512/n_probe=32 (6.25% per-query probed
    fraction), with exact probed bytes for both paths and planted
    strong-neighbor recall through each."""
    corpus_p = f"{BASE}/corpus32m"
    rec: dict = {}
    rec["datagen_sec"] = gen_vectors(spark, corpus_p, 32_000_000)
    corpus = spark.read.parquet(corpus_p)
    pq_idx = f"{BASE}/ivf_32m_pq_m16"
    if os.path.exists(pq_idx):
        shutil.rmtree(pq_idx)
    rec["build_pq_sec"], meta = t(
        lambda: build_ivf_index(
            corpus, pq_idx, n_lists=512, seed=42, pq_m_sub=16, pq_ksub=256
        )
    )
    qs = local_queries(spark, corpus, 8)
    qs_np = np.asarray([r["embedding"] for r in qs.collect()], dtype=np.float64)
    q_ids = [int(r["vec_id"]) for r in qs.collect()]
    cells = probed_cells(meta, qs_np, 32)
    rec["probed_cells"] = len(cells)
    rec["probed_bytes_raw_path"] = column_bytes(
        os.path.join(pq_idx, "index"), cells, {"vec_id", "embedding", "norm"}
    )
    rec["probed_bytes_adc_only"] = column_bytes(
        os.path.join(pq_idx, "index"), cells, {"vec_id", "pq_codes", "norm"}
    )
    rec["adc_candidate_bytes_ratio"] = round(
        rec["probed_bytes_raw_path"] / max(rec["probed_bytes_adc_only"], 1), 2
    )
    # warmup outside timing (fresh leg in a possibly fresh session)
    query_ivf_index(spark, pq_idx, qs, k=10, n_probe=32, rerank=0).count()
    rec["warm_query_raw_sec"] = min3(
        lambda: query_ivf_index(
            spark, pq_idx, qs, k=10, n_probe=32, use_pq=False
        ).count()
    )
    rec["warm_query_adc_rerank4_sec"] = min3(
        lambda: query_ivf_index(spark, pq_idx, qs, k=10, n_probe=32, rerank=4).count()
    )
    rec["warm_query_adc_only_sec"] = min3(
        lambda: query_ivf_index(spark, pq_idx, qs, k=10, n_probe=32, rerank=0).count()
    )
    rng = np.random.RandomState(13)
    planted_rows = []
    planted_by_q: dict[int, set[int]] = {}
    for qi, (qid, v) in enumerate(zip(q_ids, qs_np)):
        ids = set()
        for j in range(20):
            pid = 2 * 10**9 + qi * 100 + j
            ids.add(pid)
            planted_rows.append(
                (pid, [float(x) for x in v + 0.01 * rng.standard_normal(len(v))])
            )
        planted_by_q[qid] = ids
    planted_df = spark.createDataFrame(
        planted_rows, "vec_id long, embedding array<double>"
    )
    rec["planted_append_sec"], _ = t(lambda: ivf_append(planted_df, pq_idx))

    def planted_recall(rows) -> float:
        hits = sum(
            1 for r in rows if r["vec_id"] in planted_by_q.get(r["query_id"], ())
        )
        return round(hits / (len(q_ids) * 10), 4)

    rec["planted_recall10_adc_rerank4"] = planted_recall(
        query_ivf_index(spark, pq_idx, qs, k=10, n_probe=32, rerank=4).collect()
    )
    rec["planted_recall10_raw"] = planted_recall(
        query_ivf_index(spark, pq_idx, qs, k=10, n_probe=32, use_pq=False).collect()
    )
    rec["note"] = (
        "Residual IVF+PQ at 32M x dim-64, n_lists=512, n_probe=32, "
        "m_sub=16/ksub=256 (the build docstring's dim/4 recommendation): "
        "raw vs ADC-only vs ADC+exact-rerank warm walls on 8 "
        "pre-materialized queries, exact column-chunk probed bytes per "
        "path, and planted strong-neighbor recall (0.1-cosine margin) — "
        "the direct answer to r8's 'warm queries are scan-dominated by "
        "probed raw bytes' at the scale that measured it."
    )
    return rec


def compact_8m(spark) -> dict:
    """Leg 5: compaction cost vs the rebuild it displaces, at 8M. Ten
    append batches fragment the layout (>= 1 file per touched cell per
    batch); ivf_compact then reclusters WITHOUT the quantizer-training
    sample fetch or the O(corpus) nearest-centroid Arrow matmul a
    rebuild pays — this measures both walls on the same corpus plus the
    file counts before/after and warm-query walls on the fragmented vs
    compacted layout (the overhead compaction exists to remove)."""
    from dog_data_pipeline_spark.operators.similarity import (
        ivf_compact,
        ivf_index_dir,
    )

    corpus_p = f"{BASE}/corpus8m"
    rec: dict = {}
    rec["datagen_sec"] = gen_vectors(spark, corpus_p, 8_000_000)
    corpus = spark.read.parquet(corpus_p)
    idx = f"{BASE}/ivf_8m_frag"
    if os.path.exists(idx):
        shutil.rmtree(idx)
    rec["build_sec"], _ = t(
        lambda: build_ivf_index(
            corpus.filter(F.col("vec_id") % 2 == 0), idx, n_lists=256, seed=42
        )
    )
    batches = corpus.filter(F.col("vec_id") % 2 == 1)
    rec["append_batches"] = 10
    dt_total = 0.0
    for part in range(10):
        dt, _ = t(
            lambda: ivf_append(batches.filter(F.col("vec_id") % 20 == 2 * part + 1), idx)
        )
        dt_total += dt
    rec["appends_total_sec"] = round(dt_total, 2)
    qs = local_queries(spark, corpus, 8)
    rec["warm_query_fragmented_sec"] = min3(
        lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=16).count()
    )
    rec["compact_sec"], stats = t(lambda: ivf_compact(spark, idx))
    rec["files_before"] = stats["files_before"]
    rec["files_after"] = stats["files_after"]
    rec["warm_query_compacted_sec"] = min3(
        lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=16).count()
    )
    rebuild_idx = f"{BASE}/ivf_8m_rebuild"
    if os.path.exists(rebuild_idx):
        shutil.rmtree(rebuild_idx)
    rec["rebuild_sec"], _ = t(
        lambda: build_ivf_index(
            spark.read.parquet(ivf_index_dir(idx)).select(
                "vec_id", "embedding"
            ),
            rebuild_idx,
            n_lists=256,
            seed=42,
        )
    )
    rec["note"] = (
        "Compaction vs rebuild at 8M/256 lists: half the corpus built, "
        "the other half appended in 10 batches (fragmenting every "
        "touched cell), then ivf_compact (scan+shuffle+write, no "
        "quantizer work, no assignment matmul) vs a full build_ivf_index "
        "rebuild from the same index rows. Warm-query walls on the "
        "fragmented vs compacted layout bound what the fragmentation "
        "costs a reader at this scale; at object-store listing latencies "
        "the fragmented penalty grows with file count while the "
        "compacted layout holds ~cells files."
    )
    return rec


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app_name="soak-r9")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("all", "serving"):
        rec = serving_latency(spark)
        print(json.dumps({"ivf_serving_latency_r9": rec}), flush=True)
        merge({"ivf_serving_latency_r9": rec})
    if which in ("all", "pq"):
        rec = pq_serving_8m(spark)
        print(json.dumps({"ivf_pq_serving_8m_r9": rec}), flush=True)
        merge({"ivf_pq_serving_8m_r9": rec})
    if which in ("all", "pq32m"):
        rec = pq_serving_32m(spark)
        print(json.dumps({"ivf_pq_serving_32m_r9": rec}), flush=True)
        merge({"ivf_pq_serving_32m_r9": rec})
    if which in ("all", "compact8m"):
        rec = compact_8m(spark)
        print(json.dumps({"ivf_compact_8m_r9": rec}), flush=True)
        merge({"ivf_compact_8m_r9": rec})
    spark.stop()


if __name__ == "__main__":
    main()

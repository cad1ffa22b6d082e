"""Round-8 scale soaks (run ALONE — no concurrent Spark jobs):

1. DRIFT-TRIGGERED REBUILD AT SCALE (r7 verdict ask #2, soak leg — the
   pytest `test_ivf_drift_rebuild_restores_pruning_and_exactness` pins
   the contract at sf0.01/n_lists=8; this measures it at 2M/n_lists=64):
   append hot out-of-distribution blob batches against frozen centroids
   until `rebuild_recommended` flips, rebuild fresh from the index
   itself, and record (a) wall cost of the rebuild vs the appends it
   amortizes, (b) skew before/after, (c) the hot-spot corpus fraction a
   fixed-n_probe query scans before/after (sidecar-counts mirror of
   `_nearest_cells`) plus the measured hot-spot query wall, and
   (d) full-probe equivalence (exact top-k identical across layouts).

2. 32M-VECTOR IVF POINT (r7 verdict ask #6): third row of the append-
   invariance record (2M/n_lists=64, 8M/256 exist). n_lists=512
   continues the sqrt(N) sizing from the 8M point; n_probe=32 holds the
   probed fraction at 32/512 = 6.25%, matching the 4/64 and 16/256
   settings, so the query-cost-tracks-probed-bytes law gets its third
   point too. The same 200k batch is appended so the O(batch x n_lists)
   append law gets its third point.

Results are merged into BENCH_LOCAL_r08.json (created if the bench has
not run yet this round; bench.py carries soak keys across its own
rewrite).
"""

from __future__ import annotations

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
    ivf_verify,
    query_ivf_index,
)

ARTIFACT = os.path.join(HERE, "BENCH_LOCAL_r08.json")


def t(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def min3(fn) -> float:
    best = None
    for _ in range(3):
        dt, _ = t(fn)
        best = dt if best is None else min(best, dt)
    return best


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


def gen_vectors(spark, path: str, n: int, dim: int = 64, seed: int = 7,
                id_start: int = 0):
    """Deterministic synthetic embeddings: 50 well-separated cluster
    centers (spread ~3 per dim) + ~unit per-row noise, the same
    STATISTICAL family as the r7 soaks' numpy generator, but produced
    entirely JVM-side as hash-based column expressions (xxhash64 ->
    uniform). The first 32M attempt used the r7 mapInPandas generator
    and failed twice — GC thrash killed the python workers on the
    default heap, and a retry hung one task on an idle worker socket.
    Vector VALUES don't matter to the scaling laws being measured
    (build/append/query cost depends on row count x dim, not values);
    keeping the generation in whole-stage codegen removes the python
    boundary from the one stage that doesn't need it."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return 0.0
    # ~125MB parquet per task (the per-task shape the 2M/8M runs used)
    parts = max(32, n // 250_000)

    def unit(col, salt):
        h = F.xxhash64(col.cast("long"), F.lit(int(salt)))
        return (F.pmod(h, F.lit(1_000_000_007)).cast("double") + 0.5) / 1e9

    cid = F.col("id") % 50
    dims = []
    for j in range(dim):
        center = (unit(cid, 7_000 + j + seed) - 0.5) * 10.39  # var ~9
        noise = (unit(F.col("id"), 90_000 + j * 31 + seed) - 0.5) * 3.46  # var ~1
        dims.append(center + noise)
    df = spark.range(n).repartition(parts).select(
        (F.col("id") + id_start).alias("vec_id"),
        F.array(*dims).alias("embedding"),
    )
    dt, _ = t(lambda: df.write.mode("overwrite").parquet(path))
    return dt


def scanned_fraction(centroids, counts: dict[int, int], query_vec, n_probe: int):
    """Driver-side mirror of `_nearest_cells`: the corpus fraction a
    fixed-n_probe query at `query_vec` scans, from the sidecar counts
    alone (euclidean argsort over centroids, stable ties)."""
    mat = np.asarray(centroids, dtype=np.float64)
    v = np.asarray(query_vec, dtype=np.float64)
    d = ((mat - v[None, :]) ** 2).sum(axis=1)
    probed = np.argsort(d, kind="stable")[:n_probe]
    total = sum(counts.values())
    return sum(counts.get(int(c), 0) for c in probed) / total if total else 0.0


def drift_rebuild_2m(spark) -> dict:
    base = "/tmp/soak_r8_vec"
    corpus_p = f"{base}/corpus2m"
    rec: dict = {}
    rec["datagen_write_sec"] = gen_vectors(spark, corpus_p, 2_000_000)
    corpus = spark.read.parquet(corpus_p)

    idx = f"{base}/ivf_drift"
    if os.path.exists(idx):
        shutil.rmtree(idx)
    rec["build_2m_sec"], meta = t(
        lambda: build_ivf_index(corpus, idx, n_lists=64, seed=42)
    )
    hot = np.asarray(meta["centroids"][0], dtype=np.float64)
    dim = len(hot)

    # Hot blob: centroid-0 neighborhood with per-row, per-dim jitter (a
    # new region growing in the distribution — not identical replicas).
    # Amplitude scaled to this corpus (radius ~8 gaussians): tight
    # enough that the FROZEN quantizer funnels it into cell 0.
    def hot_batch(b: int, n: int):
        return spark.range(n).select(
            (F.col("id") + 100_000_000 + b * 10_000_000).alias("vec_id"),
            F.array(
                *[
                    F.lit(float(hot[j]))
                    + 0.15 * F.sin((F.col("id") + 1) * float(j + 1) + float(b))
                    for j in range(dim)
                ]
            ).alias("embedding"),
        )

    append_secs = []
    batches = 0
    stats = None
    while batches < 8:
        dt, stats = t(lambda: ivf_append(hot_batch(batches, 200_000), idx))
        append_secs.append(dt)
        batches += 1
        if stats["rebuild_recommended"]:
            break
    rec["hot_batches_to_trigger"] = batches
    rec["append_secs"] = append_secs
    rec["skew_drifted"] = stats["max_mean_skew"]
    rec["rebuild_recommended"] = stats["rebuild_recommended"]
    drifted_counts = {int(k): v for k, v in stats["cell_counts"].items()}

    # Hot-spot query against the DRIFTED index (5 queries in the blob)
    hot_q = hot_batch(99, 5)
    rec["hot_query_drifted_sec"] = min3(
        lambda: query_ivf_index(spark, idx, hot_q, k=10, n_probe=4).count()
    )
    rec["hot_scanned_fraction_drifted"] = round(
        scanned_fraction(meta["centroids"], drifted_counts, hot, 4), 4
    )

    # Rebuild = retrain on the CURRENT corpus (the index is the corpus
    # of record), written to a fresh path — stage-then-swap.
    current = spark.read.parquet(os.path.join(idx, "index")).select(
        "vec_id", "embedding"
    )
    idx2 = f"{base}/ivf_rebuilt"
    if os.path.exists(idx2):
        shutil.rmtree(idx2)
    rec["rebuild_plain_sec"], meta2 = t(
        lambda: build_ivf_index(current, idx2, n_lists=64, seed=42)
    )

    def skew_of(meta_x):
        counts = [int(v) for v in meta_x["cell_counts"].values()]
        return round(max(counts) / (sum(counts) / len(meta_x["centroids"])), 4)

    rebuilt_counts = {int(k): v for k, v in meta2["cell_counts"].items()}
    assert sum(rebuilt_counts.values()) == sum(drifted_counts.values())
    assert ivf_verify(spark, idx2)["consistent_after"]
    rec["skew_rebuilt_plain"] = skew_of(meta2)
    rec["hot_query_rebuilt_plain_sec"] = min3(
        lambda: query_ivf_index(spark, idx2, hot_q, k=10, n_probe=4).count()
    )
    rec["hot_scanned_fraction_rebuilt_plain"] = round(
        scanned_fraction(meta2["centroids"], rebuilt_counts, hot, 4), 4
    )

    # The MASS-BALANCED rebuild (balance_bound = the guard's skew_bound)
    # — the one the drift guard's recommendation actually calls for: the
    # plain retrain above provably reproduces the drift skew (Lloyd's
    # mean-step contracts every centroid that init lands inside the
    # tight blob to near-identical points; winner-take-all assignment
    # then empties all but one).
    idx3 = f"{base}/ivf_rebalanced"
    if os.path.exists(idx3):
        shutil.rmtree(idx3)
    rec["rebuild_balanced_sec"], meta3 = t(
        lambda: build_ivf_index(current, idx3, n_lists=64, seed=42, balance_bound=4.0)
    )
    bal_counts = {int(k): v for k, v in meta3["cell_counts"].items()}
    assert sum(bal_counts.values()) == sum(drifted_counts.values())
    assert ivf_verify(spark, idx3)["consistent_after"]
    rec["balanced_effective_lists"] = meta3["effective_lists"]
    rec["skew_rebuilt_balanced"] = skew_of(meta3)
    rec["hot_query_rebalanced_sec"] = min3(
        lambda: query_ivf_index(spark, idx3, hot_q, k=10, n_probe=4).count()
    )
    rec["hot_scanned_fraction_rebalanced"] = round(
        scanned_fraction(meta3["centroids"], bal_counts, hot, 4), 4
    )

    # Full-probe equivalence: n_probe = effective lists is exact cosine
    # top-k over the same rows — a rebuild changes LAYOUT, never RESULTS.
    def full_probe(path, lists):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in query_ivf_index(
                spark, path, hot_q, k=10, n_probe=lists
            ).collect()
        }

    drift_fp = full_probe(idx, 64)
    rec["full_probe_equal"] = (
        drift_fp == full_probe(idx2, 64)
        and drift_fp == full_probe(idx3, meta3["effective_lists"])
    )
    assert rec["full_probe_equal"]
    rec["note"] = (
        "Drift-triggered rebuild at 2M/n_lists=64 (r7 ask #2 soak leg): "
        "hot 200k blob batches (jittered neighborhood of centroid 0) "
        "appended until the default skew_bound=4.0 guard flips, then TWO "
        "rebuilds from the index itself to fresh paths: a plain retrain "
        "and a mass-balanced one (balance_bound=4.0). The plain retrain "
        "is the negative result that motivated the feature: Lloyd's is "
        "variance-seeking and its mean step collapses every centroid "
        "the init lands inside a tight drift blob, so skew and the "
        "hot-spot scanned fraction come back unchanged. The balanced "
        "build splits the blob (mass-aware sample post-pass, "
        "_split_heavy_cells) and recovery is measured three ways: "
        "sidecar skew, the hot-spot corpus fraction a fixed n_probe=4 "
        "query scans, and the measured hot-spot query wall. "
        "full_probe_equal pins that all three layouts return identical "
        "exact results at full probe."
    )
    return rec


def append_invariance_32m(spark) -> dict:
    """Third point of the append-invariance law: 32M x dim-64,
    n_lists=512 (sqrt(N) continuation of 64@2M, 256@8M), probed
    fraction held at 6.25% (n_probe=32)."""
    base = "/tmp/soak_r8_vec"
    corpus_p = f"{base}/corpus32m"
    batch_p = f"{base}/batch200k"
    rec: dict = {}
    rec["datagen_32m_sec"] = gen_vectors(spark, corpus_p, 32_000_000)
    rec["batch_datagen_sec"] = gen_vectors(
        spark, batch_p, 200_000, id_start=500_000_000
    )
    corpus = spark.read.parquet(corpus_p)
    idx = f"{base}/ivf_32m"
    if os.path.exists(idx):
        shutil.rmtree(idx)
    rec["build_32m_sec"], meta = t(
        lambda: build_ivf_index(corpus, idx, n_lists=512, seed=42)
    )
    qs = corpus.filter(F.col("vec_id") < 5)
    rec["warm_query_batch_32m_sec"] = min3(
        lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=32).count()
    )
    batch = spark.read.parquet(batch_p)
    rec["append_200k_into_32m_sec"], stats = t(lambda: ivf_append(batch, idx))
    rec["append_skew_32m"] = stats["max_mean_skew"]
    rec["note"] = (
        "Third append-invariance point (r7 ask #6): 32M x dim-64, "
        "n_lists=512 continuing the sqrt(N) sizing (64@2M, 256@8M), "
        "probed fraction held at 6.25% (n_probe=32 vs 4@2M, 16@8M). "
        "Same 200k batch appended: under the O(batch x n_lists) law the "
        "append should land near 2x the 8M point's 12.9s (n_lists "
        "doubles, batch fixed) and far under any corpus-proportional "
        "growth (corpus is 16x the 2M point); the warm query should "
        "track probed bytes (~16x the 2M point's bytes)."
    )
    return rec


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # 32 executor threads at the default 24g heap is 0.75GB/core — fine
    # for the registry bench, but the 32M leg's sustained 16GB writes GC-
    # thrashed it until the python workers died. 64g = 2GB/core, the
    # ratio a real cluster executor runs at. Must be set before the JVM
    # starts, hence env + default here rather than a conf on a live
    # session.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = get_spark(app_name="soak-r8")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("all", "drift"):
        rec = drift_rebuild_2m(spark)
        print(json.dumps({"ivf_drift_rebuild_2m_r8": rec}), flush=True)
        merge({"ivf_drift_rebuild_2m_r8": rec})
    if which in ("all", "32m"):
        rec = append_invariance_32m(spark)
        print(json.dumps({"ivf_append_invariance_32m_r8": rec}), flush=True)
        merge({"ivf_append_invariance_32m_r8": rec})
    if which in ("all", "relaw"):
        rec = scaling_law_clustered(spark)
        print(json.dumps({"ivf_scaling_law_clustered_r8": rec}), flush=True)
        merge({"ivf_scaling_law_clustered_r8": rec})
    spark.stop()




def scaling_law_clustered(spark) -> dict:
    """Clean 3-point scaling law on ONE code version (the committed r8
    write-clustered build): the headline append-invariance table mixed
    r7 unclustered measurements (2M/64, 8M/256) with the clustered 32M —
    re-measure the 2M and 8M legs clustered so the law rows are
    apples-to-apples. The 32M row comes from ivf_append_invariance_32m_r8
    (same code, same session shape)."""
    base = "/tmp/soak_r8_vec"
    out: dict = {}
    batch_p = f"{base}/batch200k"
    gen_vectors(spark, batch_p, 200_000, id_start=500_000_000)
    batch = spark.read.parquet(batch_p)
    for n, n_lists, n_probe, tag in (
        (2_000_000, 64, 4, "2m"),
        (8_000_000, 256, 16, "8m"),
    ):
        corpus_p = f"{base}/corpus{tag}_jvm"
        out[f"datagen_{tag}_sec"] = gen_vectors(spark, corpus_p, n)
        corpus = spark.read.parquet(corpus_p)
        idx = f"{base}/ivf_{tag}_law"
        if os.path.exists(idx):
            shutil.rmtree(idx)
        out[f"build_{tag}_sec"], meta = t(
            lambda: build_ivf_index(corpus, idx, n_lists=n_lists, seed=42)
        )
        qs = corpus.filter(F.col("vec_id") < 5)
        out[f"warm_query_{tag}_sec"] = min3(
            lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=n_probe).count()
        )
        out[f"append_200k_{tag}_sec"], stats = t(lambda: ivf_append(batch, idx))
        out[f"append_skew_{tag}"] = stats["max_mean_skew"]
    out["note"] = (
        "All-clustered re-measurement of the 2M/64 and 8M/256 law points "
        "(the r7 numbers for these scales predate the write-clustering "
        "fix); combine with ivf_append_invariance_32m_r8 for the 3-point "
        "law on one code version. Probed fraction held at 6.25% "
        "(n_probe 4/16/32), same 200k batch appended at every scale, "
        "JVM-side generator at every scale."
    )
    return out


if __name__ == "__main__":
    main()

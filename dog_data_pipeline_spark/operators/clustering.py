"""Clustering operators: connected components over near-dup pairs
(north-star dedup, the step after pair generation) and distributed
Lloyd k-means over embedding columns (the cluster stage of
SemDeDup-style curation when the corpus is too large to sample).

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

import numpy as np
import pandas as pd

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


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means (full-corpus refinement)
# ---------------------------------------------------------------------------

def kmeans_init_hash(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    salt: str = "km",
) -> list[list[float]]:
    """Deterministic k-means init: the vectors of the k rows with the
    smallest (md5(id:salt), id) key — a seeded uniform draw that any
    engine (and any partitioning) reproduces exactly, unlike
    rand()-based init. One TakeOrdered(k) job (per-partition heaps,
    driver merge — no global sort)."""
    hx = F.md5(F.concat(F.col("__id").cast("string"), F.lit(":" + salt)))
    rows = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .orderBy(hx, F.col("__id"))
        .limit(k)
        .collect()
    )
    return [list(map(float, r["__v"])) for r in rows]


def _lloyd_partials(centroids: list[list[float]]):
    """mapInPandas generator computing per-PARTITION Lloyd sufficient
    statistics against a closure-captured centroid matrix: for each
    cell, (count, per-dimension coordinate sums, inertia contribution).
    One BLAS matmul per Arrow batch for the assignment; the emitted
    rows are pre-exploded to (cell, pos, sx[, n, inertia on pos=0]) so
    the downstream combine is ONE groupBy — never a collect_list of
    arrays."""
    mat = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    c_sq = (mat**2).sum(axis=1)
    k, dim = mat.shape

    def gen(batches):
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        inert = np.zeros(k, dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
            d = (v**2).sum(axis=1)[:, None] - 2.0 * (v @ mat.T) + c_sq[None, :]
            a = d.argmin(axis=1)
            cnt += np.bincount(a, minlength=k)
            np.add.at(sums, a, v)
            # clamp: float cancellation can push an exact-zero distance
            # a few ulps negative
            dmin = np.maximum(d[np.arange(len(a)), a], 0.0)
            inert += np.bincount(a, weights=dmin, minlength=k)
        live = np.flatnonzero(cnt)
        yield pd.DataFrame(
            {
                "cell": np.repeat(live, dim).astype("int32"),
                "pos": np.tile(np.arange(dim, dtype="int32"), len(live)),
                "sx": sums[live].ravel(),
                "n": np.where(
                    np.tile(np.arange(dim), len(live)) == 0,
                    np.repeat(cnt[live], dim),
                    0,
                ),
                "inertia": np.where(
                    np.tile(np.arange(dim), len(live)) == 0,
                    np.repeat(inert[live], dim),
                    0.0,
                ),
            }
        )

    return gen


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
    salt: str = "km",
    init: str = "parallel",
) -> dict:
    """Distributed Lloyd k-means over the FULL corpus — the refinement
    stage that complements the bounded-sample quantizer in
    ``similarity._train_centroids``: IVF only needs a sample-quality
    coarse quantizer, but SemDeDup-style curation clusters (Abbas et
    al. 2023 use ~100k clusters over the whole corpus) want centroids
    fitted on every vector.

    Each iteration is ONE map-side-combined pass: a mapInPandas task
    reduces its entire partition to k x dim sufficient-statistic rows
    (count, coordinate sums, inertia — BLAS assignment inside), so the
    shuffle carries P x k x dim tiny rows instead of n vectors, and the
    driver folds k rows into the next centroid set (empty cells keep
    their previous centroid). Scale shape: per-iteration network cost
    is independent of n; for the k x dim ~ 10^8 extreme (k=100k,
    dim=1024) swap the final single groupBy for a two-level tree
    combine. Input is persisted across iterations and unpersisted
    before returning.

    ``init`` picks the seeding: "parallel" (default — k-means||, see
    ``kmeans_parallel_init``; uniform seeding measurably merges planted
    clusters) or "hash" (plain deterministic uniform draw).

    Returns {"centroids", "init", "inertia"} — inertia is the
    per-iteration history measured AGAINST the centroids that iteration
    assigned with (so Lloyd guarantees it non-increasing).
    """
    # NOT behind _spread (measured r13): unlike the gram explodes, every
    # pass here is LINEAR per row (one BLAS matmul), so parallelism can
    # follow the scan — and on the bench corpus (2k vectors, one file)
    # a 32-way round-robin made the ~10 passes 1.35x SLOWER on
    # interleaved floors (32 near-empty python tasks of fixed cost per
    # pass vs one trivial matmul). At real scale the scan has real
    # partitions and the passes parallelize on their own.
    vdf = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .persist()
    )
    try:
        if init == "parallel":
            seeds = kmeans_parallel_init(vdf, "__id", "__v", k, salt)
        elif init == "hash":
            seeds = kmeans_init_hash(vdf, "__id", "__v", k, salt)
        else:
            raise ValueError(f"unknown init {init!r}")
        init = seeds
        centroids = [list(c) for c in init]
        dim = len(centroids[0])
        history: list[float] = []
        schema = "cell int, pos int, sx double, n long, inertia double"
        for _ in range(iters):
            parts = vdf.select("__v").mapInPandas(
                _lloyd_partials(centroids), schema
            )
            agg = (
                parts.groupBy("cell", "pos")
                .agg(
                    F.sum("sx").alias("sx"),
                    F.sum("n").alias("n"),
                    F.sum("inertia").alias("inertia"),
                )
                .collect()
            )
            sums = {}
            cnt = {}
            total_inertia = 0.0
            for r in agg:
                sums.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["sx"]
                if r["pos"] == 0:
                    cnt[r["cell"]] = r["n"]
                    total_inertia += r["inertia"]
            history.append(total_inertia)
            centroids = [
                [s / cnt[ci] for s in sums[ci]] if cnt.get(ci) else centroids[ci]
                for ci, _ in enumerate(centroids)
            ]
        return {"centroids": centroids, "init": init, "inertia": history}
    finally:
        vdf.unpersist()


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Input columns + ``cell`` (nearest centroid id, ties to the lower
    cell — stable argsort on exact arithmetic). One Arrow-batched
    matmul per batch; map-only, no shuffle."""
    from dog_data_pipeline_spark.operators.similarity import _nearest_cells

    return df.withColumn(
        "cell",
        _nearest_cells(centroids, vec_col, 1)[0],
    )


def _min_dist2(centers: list[list[float]], vec_col: str):
    """Column: squared distance to the nearest of ``centers`` (clamped
    at 0 against float cancellation). One closure matmul per Arrow
    batch."""
    mat = np.asarray(centers, dtype=np.float64)
    c_sq = (mat**2).sum(axis=1)

    @F.pandas_udf("double")
    def _d2(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        if v.size == 0:
            return pd.Series([], dtype="float64")
        d = (v**2).sum(axis=1)[:, None] - 2.0 * (v @ mat.T) + c_sq[None, :]
        return pd.Series(np.maximum(d.min(axis=1), 0.0))

    return _d2(F.col(vec_col))


def _weighted_reduce(cands, weights, k: int):
    """Driver-side reduction of the k-means|| candidate set to k
    centers: deterministic weighted farthest-first seeding followed by
    weighted Lloyd to convergence — no RNG, so any engine reproduces
    it. Candidate count is O(rounds * oversample), driver-trivial."""
    c = np.asarray(cands, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if len(c) <= k:
        return [list(map(float, x)) for x in c]
    picked = [int(np.argmax(w))]  # heaviest candidate first
    d2 = ((c - c[picked[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(w * d2))
        picked.append(nxt)
        d2 = np.minimum(d2, ((c - c[nxt]) ** 2).sum(axis=1))
    centers = c[picked].copy()
    for _ in range(20):
        d = ((c[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = centers.copy()
        for j in range(k):
            m = a == j
            if w[m].sum() > 0:
                new[j] = (c[m] * w[m, None]).sum(axis=0) / w[m].sum()
        if np.allclose(new, centers):
            break
        centers = new
    return [list(map(float, x)) for x in centers]


def kmeans_parallel_init(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    salt: str = "km",
    rounds: int = 3,
    oversample: int | None = None,
) -> list[list[float]]:
    """k-means|| initialization (Bahmani et al., VLDB 2012 — "Scalable
    k-means++"): instead of k sequential D^2-weighted draws (k passes,
    useless at scale) or a uniform draw (arbitrarily bad seeding —
    measured here: two uniform seeds in one blob merge the other two),
    each of ``rounds`` passes samples every point INDEPENDENTLY with
    probability min(1, l * d^2/phi) where d is its distance to the
    current center set and phi the summed cost — the paper's
    oversampling step, l = ``oversample`` (default 2k). The O(rounds*l)
    weighted candidates are reduced to k on the driver (deterministic
    farthest-first + weighted Lloyd; the paper's "recluster the
    weighted candidates" step, RNG-free here so any engine replays it).

    The Bernoulli draw uses the md5(id:salt:round) uniform — the
    repo-wide deterministic-sampling idiom — so init is a pure function
    of the data. Each round costs two passes (phi, then draw); the
    final weighting pass reuses the Lloyd partials machinery. All
    driver state is O(rounds * l * dim).
    """
    l = oversample or 2 * k
    first = kmeans_init_hash(df, id_col, vec_col, 1, salt)
    centers = [list(c) for c in first]
    for r in range(rounds):
        d2 = _min_dist2(centers, vec_col)
        scored = df.select(
            F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"), d2.alias("__d2")
        )
        phi = scored.agg(F.sum("__d2")).collect()[0][0]
        if not phi or phi <= 0.0:
            break  # every point coincides with a center already
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("__cid").cast("string"),
                            F.lit(salt),
                            F.lit(str(r)),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(4294967296.0)
        drawn = scored.filter(u < F.lit(float(l)) * F.col("__d2") / F.lit(float(phi)))
        # canonical candidate order: collect() yields partition order,
        # which depends on the input layout (scan files, _spread width,
        # cluster parallelism) — and the farthest-first reduce below is
        # order-sensitive on ties, so an unsorted extend would make the
        # fitted init a function of partitioning, not of the data. Sort
        # by the draw id to keep init a pure function of the data.
        new = [
            list(map(float, row["__cv"]))
            for row in sorted(drawn.collect(), key=lambda r: r["__cid"])
        ]
        seen = {tuple(c) for c in centers}
        centers.extend([c for c in new if tuple(c) not in seen])
    # weight candidates by how many points they'd absorb, then reduce
    from dog_data_pipeline_spark.operators.similarity import _nearest_cells

    counts = dict(
        df.withColumn("__cell", _nearest_cells(centers, vec_col, 1)[0])
        .groupBy("__cell")
        .count()
        .collect()
    )
    weights = [counts.get(i, 0) for i in range(len(centers))]
    return _weighted_reduce(centers, weights, k)


# ---------------------------------------------------------------------------
# PageRank (weighted, damped, dangling-aware power iteration)
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    small_threshold: int = 500_000,
) -> DataFrame:
    """Weighted PageRank by fixed-iteration power method over an edge
    list: rank'(v) = (1-d)/N + d * (sum over u->v of rank(u) * w(u,v)
    / out_weight(u) + dangling_mass / N), the standard damped walk with
    dangling mass (rank sitting on nodes without out-edges)
    redistributed uniformly, so total rank stays 1 every iteration.

    Returns (node, rank) after exactly ``iterations`` updates from the
    uniform start — fixed iteration count (not convergence-tested) so
    the result is a pure function of the graph, replayable by any
    engine.

    Adaptive (the ``connected_components`` convention): the AGGREGATED
    (src, dst, w) edge list is usually orders of magnitude smaller than
    the raw pair stream — when it fits the driver (<= small_threshold
    edges), collect it once and run the power iteration as sparse numpy
    accumulation (np.add.at), avoiding 3 shuffle stages per iteration
    whose scheduling latency dwarfs the arithmetic on small graphs.
    Above the threshold, the distributed Pregel shape: each iteration
    is one shuffle-on-src join of ranks against the degree-normalized
    edge list plus a partial-aggregated groupBy(dst); edges are
    normalized ONCE and persisted, never re-derived. Dangling handling
    there is adaptive too: when the dangling set is EMPTY (checked up
    front) the run stays lazy — chained join/agg stages, ONE job, no
    driver round-trips; with dangling nodes, each iteration collects
    one bounded scalar (the dangling mass — the same bounded
    driver-scalar budget as the BPE merge loop). Skewed hub nodes cost
    one fat reduce partition; salt groupBy(dst) if a super-hub binds.
    """
    w = (
        F.col(weight_col).cast("double") if weight_col is not None else F.lit(1.0)
    )
    e = (
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w"))
        .groupBy("__src", "__dst")
        .agg(F.sum("__w").alias("__w"))
    )
    if small_threshold:
        # materialize the aggregated edge list ONCE (the
        # connected_components convention): it feeds the threshold
        # count and then either the driver collect or every
        # distributed iteration — without this the upstream edge
        # derivation re-runs per use
        e = e.localCheckpoint()
        if e.count() <= small_threshold:
            return _pagerank_driver(e, iterations, damping)
    outw = e.groupBy("__src").agg(F.sum("__w").alias("__ow"))
    norm = (
        e.join(outw, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__ow")).alias("__p"))
        .persist()
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    dangling = nodes.join(
        outw.withColumnRenamed("__src", "node"), "node", "left_anti"
    ).persist()
    has_dangling = bool(dangling.limit(1).count())
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for it in range(iterations):
        if has_dangling:
            dm = (
                dangling.join(ranks, "node")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                .collect()[0]["m"]
            )
        else:
            dm = 0.0
        contrib = (
            norm.join(ranks, norm["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
        )
        nxt = (
            nodes.join(contrib, nodes["node"] == contrib["__dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__c"), F.lit(0.0)) + F.lit(dm / n))
                ).alias("rank"),
            )
        )
        if has_dangling:
            # each iteration runs an action (the scalar collect), so cache
            # the frontier to keep recomputation linear, not quadratic
            nxt = nxt.persist()
            if it > 0:
                ranks.unpersist()
        ranks = nxt
    return ranks


def _pagerank_driver(e: DataFrame, iterations: int, damping: float) -> DataFrame:
    """Small-graph PageRank: the collected aggregated edge list as
    sparse numpy accumulation — identical update rule to the
    distributed loop (uniform start, uniform dangling redistribution,
    fixed iterations)."""
    import numpy as np

    rows = e.collect()
    nodes = sorted({r["__src"] for r in rows} | {r["__dst"] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    si = np.array([idx[r["__src"]] for r in rows], dtype=np.int64)
    di = np.array([idx[r["__dst"]] for r in rows], dtype=np.int64)
    ew = np.array([r["__w"] for r in rows], dtype=np.float64)
    ow = np.zeros(n)
    np.add.at(ow, si, ew)
    p = ew / ow[si]  # per-edge transition probability
    dangling = ow == 0.0
    base = (1.0 - damping) / n
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = float(r[dangling].sum())
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] * p)
        r = base + damping * (contrib + dm / n)
    node_type = e.schema["__src"].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("rank", T.DoubleType()),
        ]
    )
    return e.sparkSession.createDataFrame(
        [(v, float(r[idx[v]])) for v in nodes], schema
    )


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    checkpoint_edges: bool = True,
) -> DataFrame:
    """Per-node triangle count, degree and local clustering coefficient
    over an undirected simple graph — the canonical distributed
    triangle algorithm (Cohen 2009, "Graph twiddling in a MapReduce
    world"): orient every edge low→high, join E⋈E on the middle node
    to enumerate wedges (a<b<c), then semi-join the closing edge.

        coeff(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1))

    Scale shape: edge orientation cuts the wedge join's output in half
    and makes each triangle count exactly once (no 6-way symmetry to
    dedup). The two joins shuffle on single node keys; wedge fan-out is
    sum over nodes of deg_high(v)^2 — the quantity degree-ordering is
    known to minimize. Per-node counts come from exploding each
    triangle's 3 members into a partial-aggregated groupBy. Zero-
    triangle and degree-1 nodes stay present with coeff 0.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # the oriented edge list feeds FIVE scans below (degree union ×2,
    # wedge join ×2, closing-edge join) — without materialization the
    # whole upstream pipeline that produced the edges re-executes per
    # scan, and a LAZY checkpoint still races (concurrent stages each
    # recompute the un-materialized RDD; measured 3.3-5.4s on the
    # co-purchase query whose edges come from a basket self-join).
    # Eager materialization runs the upstream pipeline exactly once.
    # checkpoint_edges=False keeps lineage visible for plan tests.
    if checkpoint_edges:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ab = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    bc = e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    ac = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = ab.join(bc, "tb").join(ac, ["ta", "tc"])
    per_node = (
        tri.select(
            F.explode(F.array(F.col("ta"), F.col("tb"), F.col("tc"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.coalesce(
            F.try_divide(
                2.0 * F.coalesce(F.col("n_triangles"), F.lit(0)),
                F.col("degree") * (F.col("degree") - F.lit(1)).cast("double"),
            ),
            F.lit(0.0),
        ).alias("clustering_coeff"),
    )
    return out

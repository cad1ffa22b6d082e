"""Approximate-nearest-neighbor similarity search over embedding columns
(north-star ops).

Two paths:
- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; per-(query, corpus) cosine via JVM-side
  zip_with/aggregate folds; per-query top-k via ranking window. The
  corpus is never shuffled — the only shuffle is the final top-k window
  on (query_id), whose input is already reduced to (query_id, vec_id,
  score) triples.
- ``cosine_topk_lsh`` — the scale path: random-hyperplane (SimHash-style)
  signatures bucket the corpus; queries probe only matching buckets
  (optionally multi-probe with hamming-adjacent buckets), then exact
  rerank within candidates. Sub-linear probe cost; recall is tunable via
  `planes` and `probe_hamming`.
"""

from __future__ import annotations

from contextlib import contextmanager

import logging

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def _with_norm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    prefix: str,
    extra_cols: tuple = (),
) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_v"),
        *[F.col(a) for a in extra_cols],
    ).withColumn(
        f"{prefix}_norm",
        F.sqrt(F.aggregate(f"{prefix}_v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, vec_id, rank, cosine). Ties broken by corpus id —
    fully deterministic. Self-matches (same id) are excluded.
    """
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")
    dot = F.aggregate(
        F.zip_with("q_v", "c_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.select("q_id", "c_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias(id_col),
            "rank",
            "cosine",
        )
    )


def contrastive_pairs(
    corpus: DataFrame,
    anchors: DataFrame,
    k_neg: int = 5,
    margin: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    nearest SAME-label corpus vector (the positive) and the ``k_neg``
    nearest DIFFERENT-label vectors (the hard negatives), with the
    triplet margin ``pos_cos - neg_cos`` and a violation flag
    (``margin_gap < margin`` — the pairs a triplet loss would actually
    move; mining only these is the standard semi-hard curation step
    for embedding-model training data).

    Returns one row per (anchor, negative rank):
    (anchor_id, anchor_label, pos_id, pos_cos, neg_rank, neg_id,
    neg_cos, margin_gap, is_violation). Anchors with no same-label
    neighbor in the corpus are dropped (a positive is required to form
    a triplet). Ties break by ascending corpus id — deterministic.

    Scale shape: anchors are broadcast (the mining batch is small by
    construction; mine the full corpus in anchor-batches), the corpus
    is never shuffled — cosines reduce map-side to (anchor, id, label,
    cos) triples and the only exchanges are the two ranking windows on
    anchor_id plus the tiny negs-x-positives join. For corpus-scale
    anchor sets swap the scoring stage for ``cosine_topk_lsh`` /
    ``cosine_topk_ivf`` candidates and keep the window/join tail as-is.
    """
    c = _with_norm(corpus, id_col, vec_col, "c").join(
        corpus.select(
            F.col(id_col).alias("c_id"), F.col(label_col).alias("c_label")
        ),
        "c_id",
    )
    a = _with_norm(anchors, id_col, vec_col, "q").join(
        anchors.select(
            F.col(id_col).alias("q_id"), F.col(label_col).alias("q_label")
        ),
        "q_id",
    )
    dot = F.aggregate(
        F.zip_with("q_v", "c_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
        .select("q_id", "q_label", "c_id", "c_label", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    pos = (
        scored.filter(F.col("c_label") == F.col("q_label"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "q_id",
            "q_label",
            F.col("c_id").alias("pos_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("c_label") != F.col("q_label"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k_neg)
        .select(
            "q_id",
            "neg_rank",
            F.col("c_id").alias("neg_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    gap = F.col("pos_cos") - F.col("neg_cos")
    return (
        pos.join(neg, "q_id")
        .select(
            F.col("q_id").alias("anchor_id"),
            F.col("q_label").alias("anchor_label"),
            "pos_id",
            "pos_cos",
            "neg_rank",
            "neg_id",
            "neg_cos",
            gap.alias("margin_gap"),
            (gap < F.lit(float(margin))).alias("is_violation"),
        )
    )


def hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for RP-LSH signatures."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim)).tolist()


def rp_signature(vec_col, planes: list[list[float]]) -> "F.Column":
    """Random-hyperplane bit signature of an array<double> column.

    sig = OR over planes of (dot(v, plane_i) > 0) << i — one long per
    row. Implemented as a vectorized Arrow UDF doing ONE numpy matmul
    per batch: Spark's higher-order-function folds are interpreted (not
    codegen), so for dense linear algebra at planes x dim scale the
    Arrow-batched BLAS path is ~10x faster — this is the documented
    exception to 'no Python in the hot path' (pyspark guide: Pandas UDF
    over row-UDF; here Pandas UDF over interpreted HOF).
    """
    mat = np.asarray(planes, dtype=np.float64)  # (planes, dim)
    weights = (1 << np.arange(mat.shape[0], dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (v @ mat.T) > 0  # (batch, planes)
        out = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return _sig(vec_col)


def _lloyd(vectors: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's k-means on an in-memory sample (the IVF coarse
    quantizer). Empty cells are reseeded from the point farthest from
    its centroid, so all k lists stay usable."""
    n = len(vectors)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    centroids = vectors[rng.choice(n, size=k, replace=False)].copy()
    v_sq = (vectors**2).sum(axis=1)
    for _ in range(iters):
        d = v_sq[:, None] - 2.0 * (vectors @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for ci in range(k):
            mask = assign == ci
            if mask.any():
                centroids[ci] = vectors[mask].mean(axis=0)
            else:
                centroids[ci] = vectors[d.min(axis=1).argmax()]
    return centroids


def _split_heavy_cells(
    vectors: "np.ndarray",
    centroids: "np.ndarray",
    bound: float,
    max_lists: int,
    seed: int,
) -> "np.ndarray":
    """Mass-aware post-pass over a trained coarse quantizer: k-means
    allocates centroids by VARIANCE (SSE), so a tight dense region —
    exactly the shape drift-appended hot blobs take — can hold a large
    corpus fraction in one cell while contributing negligible SSE, and a
    plain retrain never splits it (measured at 2.2M/n_lists=64: a 200k
    blob at 9% of the corpus kept max/mean skew at 5.96 straight through
    a retrain — see BENCH_LOCAL_r08 `ivf_drift_rebuild_2m_r8`). IVF
    pruning cost cares about cell MASS, not variance, so rebalancing
    must too: repeatedly 2-means-split the heaviest training cell until
    every cell holds <= bound x mean or the centroid budget (max_lists)
    is spent. Driver-side over the bounded training sample only — the
    corpus is never re-read."""
    cents = np.asarray(centroids, dtype=np.float64)
    v_sq = (vectors**2).sum(axis=1)
    while len(cents) < max_lists:
        d = v_sq[:, None] - 2.0 * (vectors @ cents.T) + (cents**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        counts = np.bincount(assign, minlength=len(cents))
        heavy = int(counts.argmax())
        if counts[heavy] <= bound * (len(vectors) / len(cents)):
            break
        members = vectors[assign == heavy]
        two = _lloyd(members, 2, seed)
        if len(two) < 2 or np.allclose(two[0], two[1]):
            break  # identical replicas — no quantizer can separate them
        cents = np.vstack([np.delete(cents, heavy, axis=0), two])
    return cents


def _nearest_cells(centroids: list[list[float]], vec_prefix: str, n: int):
    """The n nearest centroid ids for a vector column, as ONE
    Arrow-vectorized pandas UDF: the centroid matrix is captured in the
    closure (broadcast with the task), each Arrow batch does a single
    BLAS matmul + stable argsort — the standard IVF assignment shape.

    This replaced a plan-literal formulation (k structs, each folding a
    dim-literal array) after profiling: the k x dim expression tree cost
    ~2s of analysis/codegen PER QUERY at k=16, dim=64 before a single
    row moved, and grows with k — at the k=4096 lists a 100 TB corpus
    wants, the literal plan is unbuildable while the matmul is
    unchanged. Ties break toward the lower cell id (stable argsort on
    an exact-arithmetic distance), matching the previous
    array_sort((d, cell)) order.
    """
    mat = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    c_sq = (mat**2).sum(axis=1)
    n = min(n, len(centroids))

    @F.pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        if v.size == 0:
            return pd.Series([], dtype=object)
        # ||v - c||^2 ranked: v.v is row-constant, so -2 v.c + c.c orders
        d = -2.0 * (v @ mat.T) + c_sq[None, :]
        idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series(list(idx))

    return _cells(F.col(vec_prefix))


def _hash_sample(
    c: DataFrame,
    max_train: int,
    id_col: str = "c_id",
    vec_col: str = "c_v",
    n_rows: int | None = None,
) -> "np.ndarray":
    """Bounded deterministic training sample: the global ``max_train``
    smallest rows by ``(hash(id), id)``, fetched WITHOUT a TakeOrdered.
    Spark's ``orderBy().limit(k)`` returns up to k rows from EVERY
    partition to the driver for the final merge, so its driver traffic
    grows as partitions x k — measured 4.1 GiB of serialized task
    results at a 32M-row / 128-file corpus (k=131072 for n_lists=512),
    over the 4g ``maxResultSize``; at cluster partition counts it is
    strictly worse. Instead: one cheap count, then a signed-hash
    THRESHOLD filter (uniform on int32, cut at ~1.5x the target
    fraction) evaluated distributed, and a driver-side trim of the
    ~1.5x max_train survivors to the exact same smallest-k set (>= k
    survivors below the cut implies the global top-k all sit below it)
    — bounded by the sample size, independent of partition count. A
    widening retry covers tail fluctuations; corpora within 2x of the
    sample size skip the filter (the trim alone is exact there).

    Precondition softened to a guard: a uniform cut underfills
    persistently only when hash values CLUSTER — duplicated id_col
    values (many rows share one hash). The first underfilled retry
    therefore RE-BASES the threshold hash onto the full (id, vec) row
    and dedupes exact duplicates: hash(id, vec) is uniform across
    distinct rows no matter how duplicated the ids are (a coarse id
    carrying many distinct vectors defeats an id-only dedup — advisor
    r9), exact-duplicate rows add nothing to quantizer training, and
    the deduped/re-based stream is persisted so the retry collects
    don't recompute its shuffle. Every collect after the guard stays
    proportional to ``mult x max_train``; the unguarded version's worst
    case was a FULL-corpus collect (the very defect this function
    replaces) once ``mult`` widened past n/max_train. The primary path
    (unique-ish ids — every real corpus) never enters the guard, so
    trained quantizers are unchanged there.
    Returns the (<=max_train, dim) float64 sample matrix."""
    sel = c.select(id_col, vec_col).withColumn("_h", F.hash(F.col(id_col)))
    n = n_rows if n_rows is not None else c.count()
    rebased = None
    try:
        if n <= 2 * max_train:
            rows = sel.collect()
        else:
            mult = 1.5
            while True:
                frac = min(mult * max_train / n, 1.0)
                if frac >= 1.0:
                    rows = sel.collect()
                    break
                cut = int(-(2**31) + frac * 2**32)
                rows = sel.filter(F.col("_h") < F.lit(cut)).collect()
                if len(rows) >= max_train:
                    break
                if rebased is None:
                    # underfill at 1.5x the uniform expectation =>
                    # clustered hashes (duplicate ids): re-base the hash
                    # on the whole row and dedup exact duplicates
                    rebased = (
                        sel.dropDuplicates([id_col, vec_col])
                        .withColumn("_h", F.hash(F.col(id_col), F.col(vec_col)))
                        .persist()
                    )
                    sel = rebased
                    n = sel.count()
                    continue
                mult *= 4.0
    finally:
        if rebased is not None:
            rebased.unpersist()
    rows.sort(key=lambda r: (r["_h"], r[id_col]))
    rows = rows[:max_train]
    return np.asarray([r[vec_col] for r in rows], dtype=np.float64)


def _train_centroids(
    c: DataFrame,
    n_lists: int,
    seed: int,
    id_col: str = "c_id",
    vec_col: str = "c_v",
    balance_bound: float | None = None,
    max_lists: int | None = None,
    n_rows: int | None = None,
    with_sample: bool = False,
):
    """IVF-style coarse quantizer on a bounded deterministic sample
    (~256 vectors per list, the FAISS convention, via ``_hash_sample``),
    then numpy Lloyd's on the driver — quantizer quality needs a fixed
    sample size regardless of corpus size.

    With ``balance_bound`` the variance-seeking Lloyd's result gets the
    mass-aware ``_split_heavy_cells`` post-pass (centroid budget
    defaults to 4 x n_lists).

    ``with_sample=True`` returns ``(centroids, sample_matrix)`` so the
    caller can reuse the already-fetched sample — per-cell mass
    estimates for write salting, PQ codebook training — without a
    second driver fetch."""
    max_train = max(256 * n_lists, 2048)
    vecs = _hash_sample(c, max_train, id_col, vec_col, n_rows=n_rows)
    cents = _lloyd(vecs, n_lists, seed)
    if balance_bound is not None:
        cents = _split_heavy_cells(
            vecs, cents, balance_bound, max_lists or 4 * n_lists, seed
        )
    out = [list(map(float, ctr)) for ctr in cents]
    return (out, vecs) if with_sample else out


def _assign_nearest(vecs: "np.ndarray", centroids: list) -> "np.ndarray":
    """Driver-side nearest-centroid assignment of a bounded sample:
    the one distance-matrix argmin shared by the salt-mass estimate,
    the residual-PQ trainer, and their callers (advisor r9: three
    copies of the same matmul; a PQ build ran it twice on one sample)."""
    mat = np.asarray(centroids, dtype=np.float64)
    d = (
        (vecs**2).sum(axis=1)[:, None]
        - 2.0 * (vecs @ mat.T)
        + (mat**2).sum(axis=1)[None, :]
    )
    return d.argmin(axis=1)


def _sample_cell_fracs(
    vecs: "np.ndarray", centroids: list, assign: "np.ndarray | None" = None
) -> list[float]:
    """Per-cell corpus-mass estimates from the (bounded) training
    sample: assign the sample to its nearest centroids and return each
    cell's fraction. Used to size write salts per CELL instead of from
    the global mean — under skew the global-mean salt makes a hot
    cell's files ~skew x rows_per_file and funnels its write through
    too few tasks (advisor finding, r8)."""
    if assign is None:
        assign = _assign_nearest(vecs, centroids)
    counts = np.bincount(assign, minlength=len(centroids))
    return (counts / max(len(vecs), 1)).tolist()


def with_prototypicality(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Cluster assignment + cosine-to-own-centroid for every vector:
    (id_col, cell, centroid_sim) joined onto the input columns.

    This is the shared scoring core of SemDeDup (drop near-identical
    cluster cores) and SSL-prototypes/D4-style pruning (drop the most
    prototypical examples — they carry the least marginal information).
    Map-only after the bounded-sample quantizer: centroids are plan
    literals, assignment and the dot fold run in one codegen'd
    projection.
    """
    c = _with_norm(emb, id_col, vec_col, "c")
    centroids = _train_centroids(c, n_clusters, seed)
    assigned = c.withColumn("cell", _nearest_cells(centroids, "c_v", 1)[0])
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in ctr]) for ctr in centroids])
    cent_norms = F.array(
        *[F.lit(float(np.sqrt(sum(x * x for x in ctr)))) for ctr in centroids]
    )
    own = F.element_at(cent_arr, F.col("cell") + 1)
    cdot = F.aggregate(
        F.zip_with(F.col("c_v"), own, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return assigned.withColumn(
        "centroid_sim",
        cdot / (F.col("c_norm") * F.element_at(cent_norms, F.col("cell") + 1)),
    )


def prototype_prune(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    prune_fraction: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """SSL-prototypes/D4 pruning flags: within each cluster, mark the
    ``prune_fraction`` MOST prototypical vectors (highest cosine to
    centroid) for removal — cluster cores are the most redundant mass
    in a training corpus. Per-cell percent_rank window; cells are
    bounded by n_clusters choice, so no single-task sort at scale.

    Returns (id_col, cell, centroid_sim, prune)."""
    scored = with_prototypicality(emb, id_col, vec_col, n_clusters, seed)
    w = Window.partitionBy("cell").orderBy(
        F.col("centroid_sim").desc(), F.col("c_id")
    )
    return scored.select(
        F.col("c_id").alias(id_col),
        "cell",
        "centroid_sim",
        (F.percent_rank().over(w) < prune_fraction).alias("prune"),
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings and deduplicating WITHIN clusters only.

    1. k-means coarse clustering (bounded-sample quantizer, centroid
       assignment as plan-literal expressions — map-only over the
       corpus);
    2. within-cluster pairwise cosine > threshold → duplicate edges
       (the self-join is per-cell: expected cost sum over cells of
       |cell|², the SemDeDup trade that replaces the N² corpus join —
       at scale you raise n_clusters to keep cells bounded);
    3. connected components over edges → duplicate groups;
    4. per group keep ONE representative — the member with the LOWEST
       cosine to its cell centroid (the paper's keep rule: prefer the
       least prototypical example, it carries the most information).

    Returns (id_col, cell, dup_group, centroid_sim, keep) for every
    vector that belongs to some duplicate group; vectors with no
    semantic duplicate are implicitly kept and not listed.
    """
    from dog_data_pipeline_spark.operators.clustering import connected_components

    # assigned feeds two actions (edge materialization inside
    # connected_components, then the group/keep join): checkpoint it
    # lazily so the scan + normalize + assign pipeline runs once
    assigned = with_prototypicality(
        emb, id_col, vec_col, n_clusters, seed
    ).localCheckpoint(eager=False)

    # within-cell duplicate edges via per-cell numpy matmul
    # (applyInPandas): the paper's shape — each cluster is pairwise-
    # compared IN MEMORY, which is exactly what bounding cell size via
    # n_clusters buys. An expression-level self-join on cell with
    # zip_with dot folds gives the same pairs but runs the interpreted
    # HOF per candidate pair — measured ~9s vs <2s at sf0.1 — while one
    # Arrow batch + BLAS matmul per cell is O(|cell|² · d) at memory
    # bandwidth.
    def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(pdf["c_v"].to_numpy())
        norms = pdf["c_norm"].to_numpy()
        ids = pdf["c_id"].to_numpy()
        sims = (x @ x.T) / np.outer(norms, norms)
        ia, ib = np.nonzero(np.triu(sims > threshold, k=1))
        # dtype-agnostic pair ordering: argsort-free elementwise min/max
        # works for ints; for strings/objects use where() on a comparison
        a, b = ids[ia], ids[ib]
        swap = a > b
        lo, hi = np.where(swap, b, a), np.where(swap, a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    # the edge schema follows the caller's id column type — a string or
    # int id corpus must not crash on a hardcoded 'long'
    id_sql_type = emb.schema[id_col].dataType.simpleString()
    edges = assigned.select("c_id", "c_v", "c_norm", "cell").groupBy(
        "cell"
    ).applyInPandas(_cell_pairs, f"id_a {id_sql_type}, id_b {id_sql_type}")

    groups = connected_components(edges)
    w = Window.partitionBy("dup_group").orderBy(F.col("centroid_sim").asc(), F.col("c_id"))
    return (
        groups.select(F.col("id").alias("c_id"), F.col("cluster").alias("dup_group"))
        .join(assigned.select("c_id", "cell", "centroid_sim"), "c_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select(
            F.col("c_id").alias(id_col), "cell", "dup_group", "centroid_sim", "keep"
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via an IVF (inverted-file) index.

    Train path: the coarse quantizer is k-means trained on a BOUNDED
    sample (~256 vectors per list, the FAISS convention) — one
    TakeOrdered job pulls a hash-ordered deterministic sample to the
    driver, then numpy Lloyd's runs in milliseconds. A distributed
    k-means here is the wrong tool: it scans the full corpus maxIter
    times (20 scheduled jobs of pure overhead at small scale, 20 full
    100-TB passes at large), while quantizer quality needs only a
    fixed-size sample regardless of corpus size. Query path: each
    vector is assigned to its nearest centroid (centroids are plan
    literals — evaluated corpus-side in one codegen'd projection);
    each query probes its `n_probe` nearest cells and exactly reranks
    only those — expected cost n_probe/n_lists of the corpus per
    query, the standard IVF recall/cost dial. Unlike RP-LSH, cells
    adapt to the data distribution.
    """
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")

    centroids = _train_centroids(c, n_lists, seed)
    c_cells = c.withColumn("cell", _nearest_cells(centroids, "c_v", 1)[0])
    q_cells = q.withColumn("cell", F.explode(_nearest_cells(centroids, "q_v", n_probe)))

    dot = F.aggregate(
        F.zip_with("q_v", "c_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
        .select("q_id", "c_id", "cosine")
        .dropDuplicates(["q_id", "c_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias(id_col),
            "rank",
            "cosine",
        )
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    balance_bound: float | None = 4.0,
    rows_per_file: int = 250_000,
    pq_m_sub: int | None = None,
    pq_ksub: int = 256,
    pq_codebooks: list | None = None,
    pq_opq: bool = False,
    pq_rotation: list | None = None,
    lock_timeout_s: float = 600.0,
    enable_upsert: bool = False,
    attr_cols: list[str] | None = None,
) -> dict:
    """Build and PERSIST an IVF index: train-once / query-many.

    ``cosine_topk_ivf`` retrains its coarse quantizer and re-assigns the
    whole corpus on every call — right for a one-shot query, wrong for a
    serving corpus. This variant assigns each vector to its nearest
    quantizer cell and writes the index as parquet PARTITIONED BY cell
    (``{path}/index/cell=N/``), with the trained centroids in a JSON
    sidecar (``{path}/ivf_meta.json``). ``query_ivf_index`` then scans
    ONLY its probed cells via partition pruning — at 100 TB each query
    batch reads ~n_probe/n_lists of the corpus at the FILE level (the
    pruning happens at planning, before any I/O), instead of filtering
    after a full scan. The index carries precomputed norms so queries
    never touch unnormalized math, and generations are immutable: the
    sidecar's ``index_dir`` field is the GENERATION POINTER every
    reader resolves through (``ivf_index_dir``), so a rebuild over a
    live index writes the next ``index.gNNNNNN`` and commits it with
    one atomic sidecar rename (the reference's stage-then-swap CSV
    convention, ``preprocessed_to_raw.py:48-52``, with the swap moved
    to a manifest flip — readers never see a half-written or missing
    data dir).

    Pass ``centroids=`` to skip quantizer training and bulk-assign
    against a GIVEN quantizer — the batch twin of ``ivf_append`` (used
    by its equivalence certificate: append-then-query must match
    bulk-build-with-the-same-centroids-then-query exactly).

    The sidecar is written driver-side (local/posix here; a real
    deployment writes it through the same object-store client as the
    parquet). It also carries per-cell row counts so ``ivf_append`` can
    run its drift guard without ever re-scanning the index.

    ``balance_bound`` (DEFAULT ON at 4.0 — ``ivf_append``'s
    ``skew_bound`` — since r9) makes the trained quantizer
    MASS-balanced, not just variance-balanced: plain k-means never
    splits a tight dense region (it contributes no SSE however many
    rows it holds), so a rebuild triggered by ``rebuild_recommended``
    after hot-blob drift would otherwise reproduce the very skew it was
    meant to fix — measured at 2.2M/n_lists=64 (skew 5.96 before AND
    after a plain retrain; balanced rebuild recovers, see
    ``_split_heavy_cells``). Balancing may grow the centroid list past
    ``n_lists`` (capped at 4x); the query path keys everything off
    ``len(centroids)``, so nothing else changes. It defaults ON because
    NATURAL skew trips the guard too: an 8M uniform-box corpus trains
    to sampled skew 5.12 with zero drift (r8 soak), so a user's first
    build + append immediately reported ``rebuild_recommended`` on a
    healthy index; the balanced build is measured free (37.93s vs
    37.55s at 8M) and keeps fresh builds under the guard. Pass ``None``
    to reproduce the plain-Lloyd's quantizer. The split is a no-op when
    the sampled masses already sit under the bound, and it is SKIPPED
    when ``centroids`` are caller-supplied (nothing was trained) — the
    sidecar then records ``balance_bound: None`` so the meta never
    claims a balance that was not applied.

    ``enable_upsert`` (opt-in) makes the index DELETABLE/UPSERTABLE via
    merge-on-read tombstones (``ivf_delete`` / ``ivf_upsert``): every
    data row carries a ``__seq`` column (the monotonically increasing
    writer sequence, 0 for the build, bumped per append/delete under
    the appender lock), deletes append ``(id, __del_seq)`` rows to a
    generation-pointed ``tombstones`` store, readers fold both with one
    anti-ish left join (a row is live iff no tombstone for its id has
    ``__del_seq > __seq``), and ``ivf_compact`` MATERIALIZES deletes
    into any cell it rewrites — the LSM/Iceberg merge-on-read shape,
    which is the only delete design that doesn't rewrite data files at
    100 TB. Off by default because the ``__seq`` column and the
    read-side join are pure overhead for append-only corpora, and a
    legacy index's files lack the column (``ivf_delete`` on one raises
    with rebuild guidance). A REBUILD never carries tombstones forward:
    the caller's ``corpus`` frame defines the new logical dataset
    (filter deletions out of it before rebuilding), so the rebuild
    resets ``write_seq`` and points at a FRESH tombstone generation,
    leaving the old one to the sweep's grace cycle.

    ``pq_m_sub`` (opt-in) additionally writes a PRODUCT-QUANTIZED codes
    column into the index and the per-subspace codebooks into the
    sidecar: each vector's ``pq_m_sub`` uint8 subspace codes, stored as
    ``pq_codes binary`` alongside the raw vector. ``query_ivf_index``
    then probes (id, cell, norm, pq_codes) ONLY — parquet column
    pruning keeps raw-vector bytes out of the candidate scan, the ADC
    shortlist reads vectors back just for the exact rerank of
    survivors. At 100 TB the probed raw bytes dominate warm-query cost
    (r8 32M soak), so this is the serving-path compression story of
    ``cosine_topk_ivfpq`` made persistent (m_sub bytes vs 8·dim per
    candidate at float64 — 64x at dim=64/m=8). ``pq_ksub`` <= 256 keeps
    one code one byte. Sizing (8M soak, BENCH_LOCAL_r09
    ivf_pq_serving_8m_r9): codes quantize RESIDUALS (v - cell centroid,
    IVFADC proper — raw-vector codes measured unusable there), and
    ``m_sub = dim/4`` (16 at dim 64, 2 bits/dim, ~32x compression)
    recovered planted strong neighbors at recall 1.0 with rerank=4,
    while ``dim/8`` needed rerank 16 for 0.63 — pick dim/4 unless the
    corpus margins are known wide. ``pq_opq=True`` additionally learns
    an OPQ rotation (Ge et al. 2013) on the residual sample — codes
    then quantize the rotated residual, decorrelating dimensions so
    the same bytes/code buy more recall on anisotropic embeddings; the
    rotation is persisted in the sidecar and applied symmetrically by
    append-encode and ADC-decode. Pass ``pq_codebooks`` (with
    ``centroids``, and ``pq_rotation`` if the quantizer was OPQ) to
    encode against a GIVEN quantizer pair — ``ivf_append``'s bulk twin
    for the append-equals-rebuild certificate.

    ``attr_cols`` (opt-in) carries ATTRIBUTE columns into the index
    rows for FILTERED ANN (``query_ivf_index(where=...)``): the
    attributes are stored beside each vector in the cell-partitioned
    parquet, so a filtered query's predicate is PUSHED DOWN into the
    probed-cell scan (partition pruning on ``cell`` + parquet
    predicate/column pushdown on the attributes — pre-filtering, never
    a post-filter of an unfiltered top-k, and no side join at query
    time). Appends must carry the same columns; they ride through
    compaction, upsert and rebuild untouched. At 100 TB this is the
    right shape for selective serving filters (tenant, language,
    license...): the alternative — joining an attribute table at query
    time — shuffles corpus-scale rows per query batch."""
    import os

    reserved = {id_col, vec_col, "norm", "cell", "pq_codes", "__seq", "__del_seq"}
    attr_cols = list(attr_cols or [])
    bad = [a for a in attr_cols if a in reserved]
    if bad:
        raise ValueError(
            f"attr_cols {bad} collide with reserved index columns {sorted(reserved)}"
        )
    missing = [a for a in attr_cols if a not in corpus.columns]
    if missing:
        raise ValueError(f"attr_cols {missing} not in corpus columns {corpus.columns}")
    c = _with_norm(corpus, id_col, vec_col, "c", extra_cols=tuple(attr_cols))
    n_rows = c.count()
    sample = None
    if centroids is None:
        centroids, sample = _train_centroids(
            c,
            n_lists,
            seed,
            balance_bound=balance_bound,
            n_rows=n_rows,
            with_sample=True,
        )
    else:
        # nothing was trained here: never claim the supplied quantizer
        # is mass-balanced (advisor r8: the old code recorded the knob's
        # value even on this branch, misrepresenting the index)
        balance_bound = None
    pq_meta = None
    encode = None
    sample_assign = (
        _assign_nearest(sample, centroids) if sample is not None else None
    )
    if pq_m_sub is not None or pq_codebooks is not None:
        if pq_codebooks is None:
            if pq_ksub > 256:
                # same bound _pq_encode_udf enforces (uint8 codes) —
                # raise here too rather than silently clamping what the
                # caller asked for (advisor r9)
                raise ValueError(f"pq_ksub {pq_ksub} > 256 does not fit uint8 codes")
            if sample is None:
                sample = _hash_sample(
                    c, max(256 * n_lists, 2048), n_rows=n_rows
                )
                sample_assign = _assign_nearest(sample, centroids)
            residuals = _residual_sample(sample, centroids, sample_assign)
            if pq_opq:
                # OPQ: codes quantize the ROTATED residuals — the
                # learned orthogonal rotation rides the sidecar next to
                # the codebooks (dim x dim floats, tiny) so append and
                # query encode/decode identically to the build
                rot, books = _train_opq(residuals, pq_m_sub, pq_ksub, seed)
                pq_rotation = [[float(x) for x in row] for row in rot]
                pq_codebooks = [cb.tolist() for cb in books]
            else:
                pq_codebooks = [
                    cb.tolist()
                    for cb in _train_pq_codebooks(
                        residuals, pq_m_sub, pq_ksub, seed
                    )
                ]
        pq_meta = {
            "m_sub": len(pq_codebooks),
            "ksub": len(pq_codebooks[0]),
            "residual": True,
            "codebooks": [
                [[float(x) for x in ctr] for ctr in cb] for cb in pq_codebooks
            ],
        }
        if pq_rotation is not None:
            pq_meta["rotation"] = [
                [float(x) for x in row] for row in pq_rotation
            ]
        encode = _pq_encode_udf(pq_codebooks, centroids, pq_rotation)
    assigned = c.withColumn("cell", _nearest_cells(centroids, "c_v", 1)[0]).select(
        F.col("c_id").alias(id_col),
        F.col("c_v").alias(vec_col),
        F.col("c_norm").alias("norm"),
        "cell",
        *attr_cols,
    )
    if encode is not None:
        assigned = assigned.withColumn("pq_codes", encode(vec_col, "cell"))
    if enable_upsert:
        # build rows are writer-sequence 0; every later append/delete
        # bumps the sidecar's write_seq under the appender lock
        assigned = assigned.withColumn("__seq", F.lit(0).cast("long"))
    # One shuffle before the write bounds the FILE COUNT: an unshuffled
    # partitionBy("cell") writes one file per (task x cell) — measured
    # 81,920 files of ~320KB for a 32M x 512-list build (160 per cell;
    # at 100 TB that is billions of small objects, and file listing
    # alone dominated the warm query). Clustering by (cell, salt) puts
    # each whole group in one task, so the writer emits about one file
    # per ``rows_per_file`` rows per cell (~130MB at dim 64). Salt mods
    # are sized PER CELL from the training sample's mass estimates
    # (advisor r8: a global-mean salt under skew makes a hot cell's
    # files ~skew x rows_per_file and funnels its write through
    # salt_mod tasks sized for the mean); with caller-supplied
    # centroids there is no sample, so the global-mean salt stands in.
    # Shuffle cost is one pass over the corpus — the standard warehouse
    # write-clustering trade.
    spark = corpus.sparkSession
    if sample is not None:
        fracs = _sample_cell_fracs(sample, centroids, sample_assign)
        salts = [
            (ci, max(1, round(n_rows * fr / rows_per_file)))
            for ci, fr in enumerate(fracs)
        ]
    else:
        gm = max(1, round(n_rows / max(len(centroids), 1) / rows_per_file))
        salts = [(ci, gm) for ci in range(len(centroids))]
    clustered = _cell_salted(spark, assigned, id_col, salts)
    # Rebuild-over-live: if the path already holds an index, write the
    # new build as the NEXT generation and commit it with the atomic
    # sidecar flip — readers on the old sidecar keep their complete
    # generation; a fresh path writes plain "index". Either way the
    # data dir named by the pointer is only ever created complete.
    # A rebuild is a WRITER, so it holds the same appender lock as
    # ivf_append/ivf_compact across read-sidecar -> write-generation ->
    # flip-sidecar (reviewer r10): an unlocked rebuild racing a locked
    # appender could have the appender's sidecar RMW restore the OLD
    # pointer, orphaning the fresh generation for the next sweep; and
    # two concurrent writers could compute the SAME next-generation
    # name and interleave writes into one corrupt directory.
    import json as _json
    from contextlib import nullcontext

    rebuilding = os.path.exists(os.path.join(path, "ivf_meta.json"))
    with _ivf_append_lock(path, lock_timeout_s) if rebuilding else nullcontext():
        gen_name, old_meta = "index", {}
        if rebuilding:
            with open(os.path.join(path, "ivf_meta.json")) as fh:
                old_meta = _json.load(fh)
            gen_name = _next_gen_name(old_meta.get("index_dir", "index"))
        (
            clustered.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(path, gen_name))
        )
        # Per-cell counts from the WRITTEN index, not a second
        # assignment pass: grouping on the partition column reads only
        # parquet footers (row counts), never vector bytes. Bounded
        # collect: <= n_lists rows.
        written = spark.read.parquet(os.path.join(path, gen_name))
        counts = {
            int(r["cell"]): int(r["n"])
            for r in written.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        meta = {
            "n_lists": n_lists,
            "effective_lists": len(centroids),
            "balance_bound": balance_bound,
            "seed": seed,
            "id_col": id_col,
            "vec_col": vec_col,
            # generation pointer: readers resolve the live data dir
            # through the sidecar (ivf_index_dir); a fresh build is
            # generation "index", compactions and rebuilds advance it
            # to index.gNNNNNN
            "index_dir": gen_name,
            "centroids": centroids,
            "attr_cols": attr_cols,
            "cell_counts": {str(k): v for k, v in sorted(counts.items())},
        }
        # row schema for readers of an EMPTY generation (reviewer r12:
        # a fold_all compaction can legally drop every row; readers
        # then need the typed schema the parquet files would have
        # carried). Taken from the written index read-back, so it is
        # exactly what a non-empty read yields (partition column
        # included).
        # same read-back relation as the counts (one file-listing /
        # footer pass, not two): the schema is exactly what a non-empty
        # read of the written generation yields, partition column
        # included
        meta["row_schema"] = written.schema.json()
        if rebuilding:
            # the displaced generation gets the same one-cycle grace
            # window a compaction grants, and the streaming replay
            # guard SURVIVES the rebuild (reviewer r10: dropping
            # last_stream_batch would re-apply an already-applied
            # replayed batch — duplicates far beyond the documented
            # narrow crash window)
            meta["prev_index_dir"] = old_meta.get("index_dir", "index")
            for guard in ("last_stream_batch", "last_stream_id"):
                if guard in old_meta:
                    meta[guard] = old_meta[guard]
        if pq_meta is not None:
            meta["pq"] = pq_meta
        if enable_upsert:
            # tombstones never carry across a rebuild (the caller's
            # corpus IS the new logical dataset): point at a FRESH
            # tombstone generation and leave the old one in the grace
            # slot for the sweep, exactly like a displaced index
            # generation
            old_up = old_meta.get("upsert") or {}
            tomb = _next_tomb_name(old_up.get("tombstones_dir", ""))
            # the sidecar is the only authority a NON-upsert rebuild
            # leaves behind — it drops the upsert block without sweeping
            # the store, so a later re-enable computing names from the
            # (empty) sidecar history could land back on a stale
            # populated dir whose old tombstones would silently delete
            # the fresh corpus's seq-0 rows (reviewer r11). Advance past
            # any name that already exists on disk.
            while os.path.isdir(os.path.join(path, tomb)):
                tomb = _next_tomb_name(tomb)
            meta["upsert"] = {
                "write_seq": 0,
                "n_tombstones": 0,
                "tombstones_dir": tomb,
                "folded_seq": {},
            }
            if old_up.get("tombstones_dir"):
                meta["upsert"]["prev_tombstones_dir"] = old_up[
                    "tombstones_dir"
                ]
        _write_ivf_meta(path, meta)
    return meta


def _cell_salted(
    spark, assigned: DataFrame, id_col: str, salts: list[tuple[int, int]]
) -> DataFrame:
    """Cluster index rows by (cell, per-cell deterministic salt bucket)
    ahead of a partitionBy("cell") write, so each cell directory gets
    ~ceil(cell_rows / rows_per_file) files written by that many tasks.
    The (cell -> salt_mod) map rides the plan as ONE flat int-array
    literal (<= 4 x n_lists entries — cheap, unlike the k x dim struct
    literals _nearest_cells replaced): an earlier broadcast-join
    formulation measured ~1.5-2.5x slower on an 8M build (the join
    barrier between the Arrow assignment eval and the exchange), for a
    lookup a projection expresses directly. The salt hashes the id so
    task retries re-land rows in the same bucket (nondeterministic
    salts under partial stage retry can duplicate or drop rows — see
    sources/warehouse.write_partitioned); a cell id past the map falls
    back to salt_mod 1 via ``try_element_at`` — reachable, not
    theoretical: ``ivf_compact`` derives salts from the SIDECAR counts,
    and a crashed append can leave cell dirs the sidecar hasn't heard
    of (the staleness ``ivf_verify`` audits); plain ``element_at``
    would THROW on those rows under ``spark.sql.ansi.enabled``
    (advisor r9) instead of defaulting."""
    by_cell = dict(salts)
    n_cells = (max(by_cell) + 1) if by_cell else 1
    mods = F.array(*[F.lit(int(by_cell.get(ci, 1))) for ci in range(n_cells)])
    salt_mod = F.coalesce(
        F.try_element_at(mods, F.col("cell").cast("int") + F.lit(1)), F.lit(1)
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), salt_mod)
    # Size the exchange to the WORK — the number of intended (cell,
    # salt) output groups, 2x over-provisioned so hash collisions
    # rarely merge two hot-cell groups into one oversized file — not
    # to spark.sql.shuffle.partitions: a small append into a large
    # session otherwise fans a 20-row batch across 32+ write tasks
    # (measured ~5s of pure task/python-worker scheduling per tiny
    # append at certificate scale), while a 32M build's 128 groups
    # under-parallelize at a session default of 32. Each group is
    # ~rows_per_file rows by construction, so group count IS the right
    # parallelism at every scale.
    n_groups = max(1, 2 * sum(by_cell.values()))
    return assigned.repartition(n_groups, F.col("cell"), salt)


def _write_ivf_meta(path: str, meta: dict) -> None:
    """Atomic sidecar write (temp + rename, posix): a reader racing an
    append sees either the old or the new sidecar, never a torn one."""
    import json
    import os

    final = os.path.join(path, "ivf_meta.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, final)


def ivf_index_dir(path: str, meta: dict | None = None) -> str:
    """Resolve the LIVE index-data directory for a persisted IVF index.

    The sidecar is the generation pointer (advisor r9 / verdict r9 ask
    #4): ``ivf_meta.json`` carries ``index_dir`` — the dirname of the
    current generation (``index`` for a fresh build, ``index.gNNNNNN``
    after compactions) — and every reader resolves through it instead
    of hardcoding ``{path}/index``. ``ivf_compact`` commits a new
    generation with ONE atomic sidecar rename (never a rename pair on
    the data directory), so a reader observes either the old complete
    generation or the new complete generation — never a missing
    ``index/``. A sidecar without the field (pre-pointer layout)
    resolves to ``index``, keeping old on-disk indexes readable.

    This is exactly the object-store deployment shape: the sidecar is
    the manifest, the generation flip is one conditional-put of a
    small JSON object, and data objects are immutable until garbage-
    collected a full generation later.

    A reader that held its sidecar SNAPSHOT across more than the sweep
    grace (by default: one full compact cycle, plus any
    ``sweep_min_age_s`` the deployment configures on ``ivf_compact``)
    can name a generation that has since been swept. That is a
    STALENESS condition, not a corrupt index — so when ``meta`` is a
    caller-held snapshot whose generation is gone while the CURRENT
    on-disk sidecar points at a live different one, this raises
    ``IvfStaleGeneration`` (verdict r10 ask #3) telling the caller to
    re-resolve, instead of letting the parquet scan surface a bare
    FileNotFoundError. A missing dir that the current sidecar ALSO
    names is left to the torn-layout repair paths (``ivf_verify`` /
    ``ivf_compact``) and returned as-is."""
    import json
    import os

    snapshot = meta is not None
    if meta is None:
        with open(os.path.join(path, "ivf_meta.json")) as fh:
            meta = json.load(fh)
    live = os.path.join(path, meta.get("index_dir", "index"))
    if snapshot and not os.path.isdir(live):
        try:
            with open(os.path.join(path, "ivf_meta.json")) as fh:
                current = json.load(fh)
        except OSError:
            return live
        cur_name = current.get("index_dir", "index")
        if cur_name != meta.get("index_dir", "index") and os.path.isdir(
            os.path.join(path, cur_name)
        ):
            raise IvfStaleGeneration(
                f"IVF generation {meta.get('index_dir', 'index')!r} under "
                f"{path} was swept after this sidecar snapshot was taken; "
                f"the live generation is {cur_name!r}. Re-load the sidecar "
                "(call ivf_index_dir(path) with no snapshot) and retry; if "
                "long-running readers hit this in steady state, raise "
                "ivf_compact's sweep_min_age_s."
            )
    return live


class IvfStaleGeneration(RuntimeError):
    """A reader's sidecar snapshot names a generation the sweep has
    already collected; the index itself is healthy — re-resolve through
    the current sidecar. Raised by ``ivf_index_dir`` instead of letting
    a parquet scan fail with FileNotFoundError (verdict r10 ask #3)."""


def _scan_index(spark, index_dir: str, meta: dict) -> DataFrame:
    """Read a generation's data rows, serving an EMPTY typed frame for
    an empty generation (reviewer r12): a ``fold_all`` compaction that
    drops every row (entire corpus tombstoned) commits a generation
    with no parquet files — a legal index state — and a bare
    ``spark.read.parquet`` on it fails with unable-to-infer-schema
    instead of returning zero rows. The sidecar carries ``row_schema``
    (recorded at every build/compact commit) precisely so readers can
    construct the typed empty frame. A legacy sidecar without the
    field falls through to the raw read — same error as before, never
    a silently-wrong schema."""
    import json as _json
    import os

    try:
        empty = not any(
            d.startswith("cell=") for d in os.listdir(index_dir)
        )
    except OSError:
        empty = False  # missing dir: let the parquet read raise
    if empty and meta.get("row_schema"):
        from pyspark.sql.types import StructType

        return spark.createDataFrame(
            [], StructType.fromJson(_json.loads(meta["row_schema"]))
        )
    return spark.read.parquet(index_dir)


def _next_gen_name(live_name: str) -> str:
    """index -> index.g000001; index.gN -> index.g{N+1} (zero-padded
    so lexicographic order is generation order)."""
    if live_name.startswith("index.g"):
        return f"index.g{int(live_name[len('index.g'):]) + 1:06d}"
    return "index.g000001"


def _next_tomb_name(live_name: str) -> str:
    """"" -> tombstones (fresh index); tombstones -> tombstones.g000001;
    tombstones.gN -> tombstones.g{N+1} — the tombstone store is
    generation-pointed exactly like the index data dir, so its GC
    rewrite commits with the same one-atomic-sidecar-flip contract."""
    if not live_name:
        return "tombstones"
    if live_name.startswith("tombstones.g"):
        return f"tombstones.g{int(live_name[len('tombstones.g'):]) + 1:06d}"
    return "tombstones.g000001"


class IvfAppendLockTimeout(TimeoutError):
    """Another writer holds the index's append lock (and is alive)."""


# Per-process re-entry depth for _ivf_append_lock, keyed by the lock
# file's abspath. Without it, a composite writer (ivf_upsert holding
# the lock across its delete+append halves, reviewer r12) would
# deadlock against ITSELF: the inner acquisition sees a lockfile whose
# pid is alive (its own) and waits out the full timeout. The lock
# stays process-scoped — the dict only short-circuits re-acquisition
# by the SAME process; cross-process exclusion is still the lockfile.
_LOCK_DEPTH: dict[str, int] = {}
_LOCK_DEPTH_GUARD = __import__("threading").Lock()


@contextmanager
def _ivf_append_lock(path: str, timeout_s: float):
    """Exclusive APPENDER lock for a persisted IVF index.

    ``ivf_append``'s sidecar update is a read-modify-write: without
    mutual exclusion, two concurrent appenders both land their parquet
    rows (parquet append never touches prior files) but one's cumulative
    cell-count update is silently lost — the index stays CORRECT, the
    drift guard just under-counts skew until ``ivf_verify --repair``.
    Readers never take this lock (the sidecar rename keeps them
    consistent); only appender-vs-appender needs it. Same hazard class
    the engine already fixed for the catalog overwrite
    (reference ``preprocessed_to_raw.py:52`` -> stage-then-swap in
    ``sources/catalog.py``) — here the fix is a lockfile because the
    sidecar is a counter, not a replaceable artifact.

    Implementation: ``O_CREAT | O_EXCL`` on ``{path}/ivf_meta.lock``
    (atomic on posix), body = JSON ``{"pid": ..., "acquired_unix": ...}``.
    Contention retries every 0.25s up to ``timeout_s``, then raises
    ``IvfAppendLockTimeout``. A lock whose pid is no longer alive (a
    crashed appender on this host) is broken automatically; the
    single-NODE liveness probe is the local/posix simplification — a
    multi-host deployment swaps this for the object store's conditional
    put (If-None-Match) or a lease service, the contract (one appender
    at a time per index) is unchanged. ``ivf_verify`` reports a held
    lock so operators can see contention/crashes.

    Pid-reuse edge (bounded, by design): if the OS recycles a crashed
    holder's pid onto an unrelated live process, the liveness probe
    keeps the stale lock alive — the waiter then blocks the full
    ``lock_timeout_s`` and raises ``IvfAppendLockTimeout`` naming the
    holder pid, and ``ivf_verify``'s ``lock_held`` shows the same pid
    for the operator to adjudicate. Worst case is a bounded wait plus a
    loud error, never a silently lost update (the failure the lock
    exists to prevent); the interleaving test
    (tests/test_dedup_similarity.py, appender-lock interleaving) pins
    the contention behavior."""
    import json
    import os
    import time

    lock = os.path.join(path, "ivf_meta.lock")
    key = os.path.abspath(lock)
    with _LOCK_DEPTH_GUARD:
        held = _LOCK_DEPTH.get(key, 0)
        if held:
            # REENTRANT within the process: ivf_upsert wraps its
            # delete+append halves in one outer acquisition so no
            # other writer can interleave between them; the halves'
            # own `with` blocks nest here instead of self-deadlocking.
            _LOCK_DEPTH[key] = held + 1
    if held:
        try:
            yield
        finally:
            with _LOCK_DEPTH_GUARD:
                _LOCK_DEPTH[key] -= 1
        return
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as fh:
                json.dump({"pid": os.getpid(), "acquired_unix": time.time()}, fh)
            break
        except FileExistsError:
            holder_pid = None
            try:
                with open(lock) as fh:
                    holder_pid = int(json.load(fh).get("pid", -1))
            except (OSError, ValueError):
                pass  # torn/vanished lock: retry resolves either way
            if holder_pid is not None and holder_pid > 0:
                try:
                    os.kill(holder_pid, 0)
                except ProcessLookupError:
                    # holder crashed without cleanup: break the stale lock
                    try:
                        os.unlink(lock)
                    except OSError:
                        pass
                    continue
                except PermissionError:
                    pass  # alive, owned by another user: treat as held
            if time.monotonic() >= deadline:
                raise IvfAppendLockTimeout(
                    f"ivf_append: {lock} held by pid {holder_pid} past "
                    f"{timeout_s}s — one appender at a time per index "
                    "(readers are unaffected)"
                )
            time.sleep(0.25)
    with _LOCK_DEPTH_GUARD:
        _LOCK_DEPTH[key] = 1
    try:
        yield
    finally:
        with _LOCK_DEPTH_GUARD:
            _LOCK_DEPTH.pop(key, None)
        try:
            os.unlink(lock)
        except OSError:
            pass


def ivf_append(
    new_vectors: DataFrame,
    path: str,
    skew_bound: float = 4.0,
    lock_timeout_s: float = 600.0,
    rows_per_file: int = 250_000,
    batch_id: int | None = None,
    stream_id: str | None = None,
    fold_bound: float = 0.10,
) -> dict:
    """INCREMENTAL append to a persisted ``build_ivf_index`` layout: the
    operation a serving corpus needs — assign ONLY the new batch against
    the EXISTING sidecar centroids (no retrain, no corpus rewrite) and
    append its rows into the ``cell=N/`` directories. Per-batch cost is
    O(batch x n_lists) — assignment scores every centroid and the write
    touches up to n_lists cell dirs — and INDEPENDENT of corpus size
    (measured: the same 200k batch appends in 6.4s to a 2M index and
    12.9s to an 8M one, the 2x being n_lists 64->256, not the corpus),
    while a rebuild re-reads and rewrites the whole corpus — at 100 TB
    the difference is the whole game (same append-only contract as the
    reference's catalog, ``preprocessed_to_raw.py:48-52``, and the
    minhash signature index, ``dedup.py``
    minhash_lsh_pairs_incremental).

    Drift guard: appending forever against frozen centroids degrades
    probe pruning as the data distribution moves — hot cells fatten and
    a fixed n_probe scans an ever-larger corpus fraction. The sidecar
    carries cumulative per-cell counts (updated here from a bounded
    <= n_lists aggregate of the BATCH only — the index is never
    re-scanned); when max_cell/mean_cell exceeds ``skew_bound`` the
    returned stats set ``rebuild_recommended`` so the caller schedules a
    retrain (``build_ivf_index`` fresh, and pass
    ``balance_bound=skew_bound``: drift blobs are typically DENSER than
    the corpus, and a plain variance-seeking retrain provably fails to
    split them — the balanced build is the one that actually restores
    pruning). Appends remain correct either way — queries scan whatever
    the probed cells hold; skew costs time, not results.

    Concurrency contract: ONE APPENDER AT A TIME per index, enforced by
    an exclusive lockfile (``{path}/ivf_meta.lock``) held across the
    whole read-sidecar -> write-parquet -> write-sidecar sequence — a
    second appender waits (up to ``lock_timeout_s``, then
    ``IvfAppendLockTimeout``) rather than silently losing its cell-count
    update to a read-modify-write race. Readers never block: parquet
    append of new files into existing partition dirs never touches prior
    files, and the sidecar swap is atomic, so concurrent readers see a
    consistent (old or old+new) index throughout. A lock left by a
    crashed appender on this host is broken automatically (pid liveness
    probe); ``ivf_verify`` reports a held lock either way.

    ``batch_id`` / ``stream_id`` (for streaming ingest,
    ``streaming/ann_ingest.py``): Structured Streaming's foreachBatch
    replays a failed micro-batch under the SAME monotonically
    increasing batch id, so the sidecar records the last applied id
    under the appender lock and a replayed id returns
    ``{"appended": 0, "skipped_replay": True}`` without touching the
    index — the effectively-once ingest contract. Batch ids are scoped
    to ONE checkpoint: a new or relocated checkpoint restarts ids at 0,
    so comparing ids alone would silently DROP the new stream's early
    batches as "replays" (advisor r9). ``stream_id`` (the ingest sink
    passes its checkpoint location) is therefore recorded alongside
    ``last_stream_batch``, and the skip applies only when BOTH match;
    a different ``stream_id`` is a fresh stream — its batch applies and
    takes over the guard. One identified stream at a time per index:
    alternating two live streams on one index thrashes the guard and
    forfeits replay protection (serve that shape with one checkpoint
    per index). A legacy caller passing ``batch_id`` without
    ``stream_id`` keeps the id-only comparison, and a sidecar whose
    watermark predates the identity field matches ANY stream on first
    contact (adopt-on-first-contact — a same-checkpoint code upgrade
    must still skip its replayed batch; a relocated checkpoint on such
    a legacy-fed index should clear ``last_stream_batch`` first). The one uncovered
    window is a crash AFTER the parquet write and BEFORE the sidecar
    update: the replay then re-appends that batch's rows (duplicate
    ids in their cells). Results stay exact — the query path
    de-duplicates (query, id) pairs — and ``ivf_verify`` flags the
    rows-vs-sidecar divergence for repair; the next drift-triggered
    rebuild removes the duplicate rows.

    Returns the updated meta plus ``{"appended": n, "max_mean_skew": s,
    "rebuild_recommended": bool}``; on an upsert-enabled index also
    the tombstone-accumulation signal (``n_tombstones``,
    ``tombstone_ratio``, ``fold_recommended`` vs ``fold_bound`` — see
    ``_fold_signal``), so a pure-append caller still learns when a
    delete-heavy index is due for ``ivf_compact(fold_all=True)``."""
    import json
    import os

    with _ivf_append_lock(path, lock_timeout_s):
        with open(os.path.join(path, "ivf_meta.json")) as fh:
            meta = json.load(fh)
        # A sidecar with NO recorded identity (pre-identity sink, or a
        # legacy caller wrote the watermark) matches any stream —
        # adopt-on-first-contact (reviewer r10): the common upgrade
        # path is the SAME checkpoint continuing after a code upgrade,
        # where a replayed batch must still be skipped. The transitional
        # ambiguity — a genuinely NEW checkpoint touching a legacy-fed
        # index could have its first batches <= the legacy watermark
        # skipped — lasts one adoption; operators relocating a
        # checkpoint on a legacy-fed index should clear
        # last_stream_batch in the sidecar first.
        same_stream = stream_id is None or meta.get("last_stream_id") in (
            None,
            stream_id,
        )
        if (
            batch_id is not None
            and stream_id is None
            and meta.get("last_stream_id") is not None
        ):
            # A legacy caller (batch_id without stream_id) on an index
            # whose watermark an IDENTIFIED stream owns compares against
            # that stream's watermark: its batches <= it are dropped as
            # replays even though they are a different stream's ids.
            # Documented behavior, but never silent (reviewer r10) — a
            # mixed legacy/identified deployment is a misconfiguration
            # the operator must be able to see in the logs.
            logger.warning(
                "ivf_append: batch_id=%s passed WITHOUT stream_id on an "
                "index whose replay watermark (last_stream_batch=%s) is "
                "owned by stream %r — the legacy batch id is compared "
                "against that stream's watermark and may be dropped as a "
                "replay. Pass stream_id (the checkpoint location) or "
                "clear last_stream_batch in the sidecar.",
                batch_id,
                meta.get("last_stream_batch"),
                meta.get("last_stream_id"),
            )
        if (
            batch_id is not None
            and same_stream
            and int(meta.get("last_stream_batch", -1)) >= int(batch_id)
        ):
            counts = {
                int(k): v for k, v in meta.get("cell_counts", {}).items()
            }
            mean = sum(counts.values()) / max(len(meta["centroids"]), 1)
            skew = (max(counts.values()) / mean) if counts and mean else 0.0
            meta.update(
                {
                    "appended": 0,
                    "skipped_replay": True,
                    "max_mean_skew": round(skew, 4),
                    # cumulative skew doesn't reset on a skipped tick:
                    # an index already past the bound must still tell
                    # its caller (advisor r9 — hardcoding False here
                    # masked drift on replay ticks)
                    "rebuild_recommended": skew > skew_bound,
                }
            )
            if meta.get("upsert"):
                meta.update(_fold_signal(meta, fold_bound))
            return meta
        id_col, vec_col = meta["id_col"], meta["vec_col"]

        attrs = list(meta.get("attr_cols") or [])
        missing = [a for a in attrs if a not in new_vectors.columns]
        if missing:
            raise ValueError(
                f"index at {path} carries attribute columns {attrs} "
                f"(filtered-ANN build): the append batch is missing "
                f"{missing}"
            )
        c = _with_norm(new_vectors, id_col, vec_col, "c", extra_cols=tuple(attrs))
        assigned = c.withColumn(
            "cell", _nearest_cells(meta["centroids"], "c_v", 1)[0]
        ).select(
            F.col("c_id").alias(id_col),
            F.col("c_v").alias(vec_col),
            F.col("c_norm").alias("norm"),
            "cell",
            *attrs,
        )
        if meta.get("pq"):
            # the index carries PQ codes: encode the batch against the
            # SIDECAR codebooks + centroids (frozen together — appended
            # rows must score identically to bulk-built ones)
            assigned = assigned.withColumn(
                "pq_codes",
                _pq_encode_udf(
                    meta["pq"]["codebooks"],
                    meta["centroids"],
                    meta["pq"].get("rotation"),
                )(
                    vec_col, "cell"
                ),
            )
        if meta.get("upsert"):
            # an upsert-enabled index versions every row: this append's
            # rows get the next writer sequence so earlier tombstones
            # (strictly smaller __del_seq) never apply to them. The
            # sequence is RESERVED — written to the sidecar — before any
            # row lands (reviewer r11): without the reservation, a crash
            # between the parquet write and the sidecar update leaves
            # rows at write_seq+1 that the NEXT delete (also write_seq+1)
            # could never kill under the strict > fold — served rows a
            # delete silently fails to remove. With it, a crash after
            # the reservation merely burns a sequence number, and a
            # crash after the parquet write leaves rows at a sequence
            # the watermark already covers (stale counts only — the
            # same ivf_verify-repairable window as a non-upsert append).
            next_seq = int(meta["upsert"].get("write_seq", 0)) + 1
            meta["upsert"]["write_seq"] = next_seq
            _write_ivf_meta(path, meta)
            assigned = assigned.withColumn(
                "__seq", F.lit(next_seq).cast("long")
            )
        # One pass over the batch: cache so the write and the <= n_lists
        # count aggregate don't recompute the assignment.
        assigned = assigned.persist()
        try:
            # Counts BEFORE the write so the write can be salted per
            # cell. Clustering by cell bounds the file count, same
            # rationale as build_ivf_index: an unshuffled partitionBy
            # emits one file per (task x touched cell) — measured
            # 32 x 512 = ~16k ~12-row files for a 200k append into a
            # 512-list index. The per-cell salt (advisor r8) keeps a
            # HOT batch — e.g. an all-one-cell drift blob — from
            # funneling through a single task: each touched cell gets
            # ~ceil(batch_cell_rows / rows_per_file) files/tasks
            # (appends accumulate files by design; compaction IS the
            # drift-triggered rebuild).
            batch_counts = {
                int(r["cell"]): int(r["n"])
                for r in assigned.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            salts = [
                (cell, max(1, round(n / rows_per_file)))
                for cell, n in batch_counts.items()
            ]
            clustered = _cell_salted(
                new_vectors.sparkSession, assigned, id_col, salts
            )
            clustered.write.mode("append").partitionBy("cell").parquet(
                ivf_index_dir(path, meta)
            )
        finally:
            assigned.unpersist()

        counts = {int(k): v for k, v in meta.get("cell_counts", {}).items()}
        appended = 0
        for cell, n in batch_counts.items():
            counts[cell] = counts.get(cell, 0) + n
            appended += n
        mean = sum(counts.values()) / max(len(meta["centroids"]), 1)
        skew = (max(counts.values()) / mean) if counts and mean else 0.0
        meta["cell_counts"] = {str(k): v for k, v in sorted(counts.items())}
        if batch_id is not None:
            old_watermark = int(meta.get("last_stream_batch", -1))
            meta["last_stream_batch"] = int(batch_id)
            if stream_id is not None:
                if (
                    meta.get("last_stream_id") not in (None, stream_id)
                    and int(batch_id) <= old_watermark
                ):
                    # identity takeover at a batch id the old identity's
                    # watermark already covered: legitimate for a truly
                    # NEW checkpoint (ids restart at 0), but ALSO the
                    # exact signature of the same checkpoint whose
                    # recorded identity changed form (e.g. the r11
                    # abspath->verbatim-URI fix), where this batch is a
                    # duplicate. Loud either way (reviewer r11) —
                    # operators upgrading URI-checkpoint indexes should
                    # clear last_stream_batch in the sidecar first.
                    logger.warning(
                        "ivf_append: stream identity takeover %r -> %r at "
                        "batch_id=%s (old watermark %s): if this is the "
                        "SAME checkpoint under a changed identity form, "
                        "this batch was applied as a duplicate.",
                        meta.get("last_stream_id"),
                        stream_id,
                        batch_id,
                        old_watermark,
                    )
                # a new checkpoint/query takes over the replay guard;
                # its ids compare only against its own high-water mark
                meta["last_stream_id"] = stream_id
        _write_ivf_meta(path, meta)
    meta.update(
        {
            "appended": appended,
            "max_mean_skew": round(skew, 4),
            "rebuild_recommended": skew > skew_bound,
        }
    )
    if meta.get("upsert"):
        meta.update(_fold_signal(meta, fold_bound))
    return meta


def _fold_signal(meta: dict, fold_bound: float) -> dict:
    """Thresholded live-tombstones-vs-indexed-rows signal (r11 verdict
    ask #2) — the delete-side mirror of ``rebuild_recommended``: the
    merge-on-read design bounds read cost only "by compaction cadence",
    so the writers must TELL the caller when that cadence is due.

    ``tombstone_ratio`` = sidecar ``n_tombstones`` / sum(cell_counts);
    ``fold_recommended`` trips when the ratio exceeds ``fold_bound``
    (default 0.10: tombstones at 10% of indexed rows — the measured 2M
    fold put 5% overhead below box noise, so 10% flags well before the
    read-side join is felt). Both terms are sidecar ESTIMATES: counts
    include not-yet-folded superseded rows, and ``n_tombstones``
    overcounts duplicate replays / undercounts a torn delete — fine
    for an operational trigger, never used for correctness (readers
    always fold from the store itself). The caller's response is
    ``ivf_compact(..., fold_all=True)`` (or an opportunistic minor
    compaction), which materializes the fold and GCs the tombstones.
    """
    counts = meta.get("cell_counts", {})
    indexed = sum(int(v) for v in counts.values())
    n_tomb = int((meta.get("upsert") or {}).get("n_tombstones", 0))
    ratio = n_tomb / max(indexed, 1)
    return {
        "n_tombstones": n_tomb,
        "tombstone_ratio": round(ratio, 6),
        "fold_recommended": n_tomb > 0 and ratio > fold_bound,
    }


def ivf_delete(
    spark,
    path: str,
    ids,
    lock_timeout_s: float = 600.0,
    fold_bound: float = 0.10,
) -> dict:
    """DELETE ids from an upsert-enabled persisted IVF index — by
    merge-on-read tombstone, never by rewriting data files.

    At 100 TB a delete that rewrites the cells holding its ids costs a
    corpus-scale job per delete batch; the LSM/Iceberg answer is to
    append the delete as DATA: one ``(id, __del_seq)`` row per deleted
    id into the index's generation-pointed ``tombstones`` store, where
    ``__del_seq`` is the next writer sequence (taken under the same
    appender lock every writer holds). Readers fold tombstones at query
    time (``query_ivf_index``: a row is live iff no tombstone for its
    id carries ``__del_seq`` strictly greater than the row's
    ``__seq``), and ``ivf_compact`` MATERIALIZES them into any cell it
    rewrites, garbage-collecting fully-folded tombstones. Deleting an
    id the index never held is a no-op by construction.

    The strict ``>`` fold direction is the crash-safety contract: the
    tombstone parquet lands BEFORE the sidecar bump, so a crash between
    the two leaves tombstone rows whose sequence a later writer may
    REUSE — equal-sequence data rows (that writer's append) must
    survive, and they do, while every row the delete targeted (strictly
    older) still dies. A replayed delete simply appends duplicate
    tombstone rows at a newer sequence; the read-side MAX-per-id
    aggregate makes duplicates harmless.

    ``ids`` is a DataFrame carrying the index's id column, or a plain
    iterable of ids. Requires ``build_ivf_index(enable_upsert=True)``
    — a legacy index's data files lack the ``__seq`` column, so there
    is nothing a tombstone could compare against; raises ValueError
    with rebuild guidance rather than silently mass-deleting
    (every legacy row would look older than any tombstone).

    Returns ``{"deleted_ids": n, "write_seq": s, "n_tombstones":
    total, "tombstone_ratio": r, "fold_recommended": bool}``
    (``deleted_ids`` counts distinct tombstoned ids in this call;
    ``n_tombstones`` the sidecar's cumulative estimate;
    ``fold_recommended`` trips when tombstones exceed ``fold_bound``
    of the indexed rows — the caller's cue to schedule
    ``ivf_compact(fold_all=True)``, see ``_fold_signal``)."""
    import json
    import math
    import os

    with _ivf_append_lock(path, lock_timeout_s):
        with open(os.path.join(path, "ivf_meta.json")) as fh:
            meta = json.load(fh)
        up = meta.get("upsert")
        if not up:
            raise ValueError(
                f"index at {path} was not built with enable_upsert=True: "
                "its rows carry no __seq column for tombstones to compare "
                "against. Rebuild with build_ivf_index(..., "
                "enable_upsert=True) (filtering already-deleted rows out "
                "of the corpus) to make it deletable."
            )
        id_col = meta["id_col"]
        if isinstance(ids, DataFrame):
            del_df = ids.select(id_col).dropDuplicates([id_col])
            n = del_df.count()
        else:
            ids_list = list(dict.fromkeys(ids))
            n = len(ids_list)
            del_df = (
                spark.createDataFrame(pd.DataFrame({id_col: ids_list}))
                if n
                else None
            )
        if not n:
            # empty delete: no tombstones, no sequence burn
            return {
                "deleted_ids": 0,
                "write_seq": int(up.get("write_seq", 0)),
                **_fold_signal(meta, fold_bound),
            }
        seq = int(up.get("write_seq", 0)) + 1
        del_df = del_df.withColumn("__del_seq", F.lit(seq).cast("long"))
        # bound the store's file count: one file per ~5M tombstones
        (
            del_df.repartition(max(1, math.ceil(n / 5_000_000)))
            .write.mode("append")
            .parquet(os.path.join(path, up["tombstones_dir"]))
        )
        up["write_seq"] = seq
        up["n_tombstones"] = int(up.get("n_tombstones", 0)) + n
        _write_ivf_meta(path, meta)
    return {
        "deleted_ids": n,
        "write_seq": seq,
        **_fold_signal(meta, fold_bound),
    }


def ivf_upsert(new_vectors: DataFrame, path: str, **append_kwargs) -> dict:
    """UPSERT into an upsert-enabled persisted IVF index: re-embedded
    documents replace their previous vectors (latest-wins by id).

    Implementation is tombstone-then-append under ONE appender-lock
    acquisition held across both halves: the batch's ids are
    tombstoned at sequence S (``ivf_delete``), then the batch itself
    appends at sequence S+1 (``ivf_append``) — the strict
    ``__del_seq > __seq`` fold kills every older version of those ids
    and spares the new rows, with no read-modify-write of any data
    file. Holding the lock across the pair (reviewer r12) is what
    makes concurrent upserts of the same id serialize as whole
    operations — released between halves, two upserts could
    interleave as del@1, del@2, app@3, app@4 and leave TWO live
    versions of the id forever (both appends newer than both
    tombstones), silently breaking latest-wins. The pair is still NOT
    atomic to READERS (who never take the lock): a query landing
    between the halves sees the ids briefly absent (never a torn mix
    of old and new). A crash between them leaves the ids deleted but
    not re-added — re-running the upsert (the natural retry)
    converges, which is the same effectively-once-by-retry contract
    the streaming ingest uses. An id new to the index upserts as a
    plain insert (its tombstone targets nothing).

    Accepts ``ivf_append`` keyword args (``skew_bound``,
    ``batch_id``/``stream_id`` for streaming upsert, ...). Returns the
    append's stats dict plus ``{"tombstoned_ids": n}``.

    STREAMING REPLAY is guarded BEFORE the tombstone, not just at the
    append: a replayed micro-batch that only skipped the append would
    still write a fresh (newer-sequence) tombstone for ids whose rows
    the FIRST application already appended — silently deleting the
    very rows the upsert installed. So when ``batch_id`` is already
    covered by the index's replay watermark (same stream-identity
    rules as ``ivf_append``), the whole upsert returns
    ``{"appended": 0, "skipped_replay": True, "tombstoned_ids": 0}``
    without touching the store. The guard is read outside the lock —
    safe under the streaming contract (ONE identified stream per
    index, micro-batches serialized by foreachBatch); a crash between
    the delete and the append replays as delete-again + append, which
    converges."""
    spark = new_vectors.sparkSession
    import json
    import os

    with open(os.path.join(path, "ivf_meta.json")) as fh:
        meta = json.load(fh)
    batch_id = append_kwargs.get("batch_id")
    stream_id = append_kwargs.get("stream_id")
    same_stream = stream_id is None or meta.get("last_stream_id") in (
        None,
        stream_id,
    )
    if (
        batch_id is not None
        and same_stream
        and int(meta.get("last_stream_batch", -1)) >= int(batch_id)
    ):
        return {"appended": 0, "skipped_replay": True, "tombstoned_ids": 0}
    lock_timeout_s = append_kwargs.get("lock_timeout_s", 600.0)
    # ONE lock acquisition across both halves (the inner ivf_delete /
    # ivf_append acquisitions re-enter it): concurrent upserts of the
    # same id serialize as whole del+append operations, never
    # interleaved halves (reviewer r12 — see docstring).
    with _ivf_append_lock(path, lock_timeout_s):
        del_stats = ivf_delete(
            spark,
            path,
            new_vectors.select(meta["id_col"]),
            lock_timeout_s=lock_timeout_s,
        )
        stats = ivf_append(new_vectors, path, **append_kwargs)
    stats["tombstoned_ids"] = del_stats["deleted_ids"]
    return stats


def _tombstones_frame(spark, path: str, meta: dict):
    """-> (max-__del_seq-per-id DataFrame | None, n_tombstones_est).

    None when the index is not upsert-enabled or the live tombstone
    generation holds no files — the common append-only case pays zero
    read-side cost (one driver-side listdir). The store is read
    directly (never trusted from ``n_tombstones`` alone) so a delete
    whose crash landed tombstone rows but not the sidecar bump is
    still honored by readers.

    The returned count is a broadcast-sizing estimate derived from the
    STORE, not the sidecar alone (reviewer r12): the sidecar's
    ``n_tombstones`` undercounts exactly when it matters — a torn
    delete lands tombstone parquet without the sidecar bump, and
    sizing the fold join from the stale counter could broadcast a
    store far past the intended memory bound. The same scandir that
    finds the files sums their bytes; the estimate is
    ``max(sidecar_count, total_bytes // 8)`` — the sidecar as a lower
    bound, and bytes/8 as a deliberately conservative rows-per-byte
    floor for an (id, long) parquet (dictionary-compressed stores
    undercount rows, but then the broadcast is small in BYTES, which
    is what the bound protects)."""
    import os

    up = meta.get("upsert")
    if not up:
        return None, 0
    tomb_dir = os.path.join(path, up.get("tombstones_dir", "tombstones"))
    store_bytes = 0
    try:
        with os.scandir(tomb_dir) as it:
            for entry in it:
                if entry.name.endswith(".parquet") and entry.is_file():
                    store_bytes += entry.stat().st_size
    except OSError:
        store_bytes = 0
    if not store_bytes:
        return None, 0
    tomb = (
        spark.read.parquet(tomb_dir)
        .groupBy(meta["id_col"])
        .agg(F.max("__del_seq").alias("__del_seq"))
    )
    n_est = max(int(up.get("n_tombstones", 0)), store_bytes // 8)
    return tomb, n_est


def _fold_tombstones(idx: DataFrame, tomb, n_tombstones: int, id_col: str):
    """Merge-on-read: drop index rows an id-matching tombstone with a
    STRICTLY newer sequence covers. Broadcast the folded tombstone side
    while it plausibly fits in executor memory (ids + one long — ~50MB
    at the 2M bound; the count is ``_tombstones_frame``'s store-derived
    estimate, so a torn delete's unrecorded rows still push past the
    bound); past that, fall back to a shuffle join and let AQE size
    it."""
    if tomb is None:
        return idx
    side = F.broadcast(tomb) if n_tombstones <= 2_000_000 else tomb
    return (
        idx.join(side, id_col, "left")
        .filter(
            F.col("__del_seq").isNull()
            | (F.col("__seq") >= F.col("__del_seq"))
        )
        .drop("__del_seq")
    )


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    exclude_self: bool = True,
    use_pq: bool | None = None,
    rerank: int = 4,
    where: str | None = None,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine against a persisted ``build_ivf_index`` layout.

    Probed cells are computed query-side (<= n_lists ids, one bounded
    collect), and the index scan carries ``cell IN (probed)`` on the
    PARTITION column — Catalyst prunes the unprobed cell directories
    before any file is opened (verify with ``df.inputFiles()``). Scoring
    and ranking match ``cosine_topk_ivf`` exactly (same fold, same
    tie-breaks), and results are bit-identical to the in-memory path on
    the same corpus FOR THE SAME QUANTIZER — i.e. when the index was
    built with ``balance_bound=None``, or when the default balance pass
    no-ops because the sampled masses sit under the bound
    (``cosine_topk_ivf`` always trains plain Lloyd's; an index whose
    build split a hot cell probes a different — better-pruned — cell
    set by design).

    When the index was built with PQ codes (``pq_m_sub``) the probe
    runs ADC-first by default (``use_pq=None`` auto-detects; ``False``
    forces the raw path, ``True`` raises if the index has no codes):
    the candidate scan reads (id, cell, norm, pq_codes) only — parquet
    COLUMN pruning keeps the raw-vector bytes out of the probed I/O,
    the dominant warm-query cost at scale (r8 32M soak) — scores
    reconstructed dots per query, keeps the per-query top ``rerank*k``
    ADC survivors, then exactly reranks them. Returned cosines are
    EXACT with ``rerank >= 1`` (the rerank recomputes from raw
    vectors); PQ affects which candidates make the shortlist, so its
    recall certificate is the same floor+dominance pattern as
    ``cosine_topk_ivfpq``.

    Rerank I/O, honestly: the survivor fetch is a broadcast semi-join
    into the same cell-pruned scan, so the scan DECODES the probed
    cells' raw-vector column once more and discards non-survivors at
    the join (parquet gives no point lookups; an IN-list past Spark's
    pushdown threshold degrades to a useless [min,max] range). What
    makes it scale is AMORTIZATION, not skipping: the rerank pass costs
    one vector-column read of the probed cells PER QUERY BATCH,
    independent of batch size, while the ADC candidate stage (the
    per-query-pair work: scoring, shuffle, top-k state) runs on 64x
    smaller rows — so for serving batches of any real size the exact
    path's marginal per-query cost is the ADC stage's. ``rerank=0``
    skips the fetch entirely and returns the ADC approximation in the
    ``cosine`` column (codes-only serving: probed bytes are the codes,
    full stop — the mode for recall-tolerant candidate generation).

    FILTERED ANN (r12): ``where`` is a SQL predicate over the index's
    own columns — the id, ``cell``, and any ``attr_cols`` the build
    stored beside the vectors — applied as a PRE-filter: candidates
    are restricted before ADC scoring, ranking and rerank, so the
    result is the exact (modulo probe recall) top-k AMONG matching
    rows, never a post-filtered top-k that comes back short. Because
    the attributes live in the index parquet, the predicate pushes
    into the probed-cell scan (partition pruning + PushedFilters) with
    no query-time join. ``allowed_ids`` (a DataFrame carrying the id
    column) is the companion for bounded id sets — ACLs, candidate
    shortlists — applied as a broadcast semi-join; corpus-scale
    filters belong in ``where``. Both compose with each other, with
    PQ/rerank, and with the tombstone fold.

    PROBE SIZING under filters (2M measurement,
    ``ivf_filtered_ann_2m_r12``): a filter that is INDEPENDENT of the
    embedding geometry (hash-like tenant/language labels) keeps
    matching rows in every probed cell — recall holds at fixed
    ``n_probe`` and wall-clock DROPS with selectivity (scoring work
    is proportional to surviving candidates: 41.7s unfiltered ->
    1.9s at 1% on the 2M box run, recall 1.0). A filter CORRELATED
    with geometry (tenant == cluster: all matches in cells the probe
    never visits) silently starves the candidate set — short results
    and collapsed recall (0.14 measured). For such filters WIDEN
    ``n_probe`` toward full probe: the filter itself makes it
    affordable (full-probe filtered: 12.6s, exactly equal to brute
    force over the physical subcorpus — still ~3x under the
    unfiltered 8-probe baseline)."""
    import json
    import os

    with open(os.path.join(path, "ivf_meta.json")) as fh:
        meta = json.load(fh)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    centroids = meta["centroids"]
    if use_pq is None:
        use_pq = bool(meta.get("pq"))
    elif use_pq and not meta.get("pq"):
        raise ValueError(f"use_pq=True but index at {path} has no pq codes")

    q = _with_norm(queries, id_col, vec_col, "q")
    q_cells = q.withColumn(
        "cell", F.explode(_nearest_cells(centroids, "q_v", n_probe))
    )
    if n_probe >= len(centroids):
        # FULL probe: _nearest_cells clamps to len(centroids), so every
        # query probes every cell and the probed set is statically all
        # centroid ids — skip the distinct-collect job (one Spark action
        # per query batch, pure fixed cost; the certificates' exactness
        # legs all serve full-probe). Empty-query batches still return
        # empty below (the scoring join is against the empty q_cells).
        probed = list(range(len(centroids)))
    else:
        probed = sorted(
            r["cell"] for r in q_cells.select("cell").distinct().collect()
        )
    idx = _scan_index(spark, ivf_index_dir(path, meta), meta).filter(
        F.col("cell").isin(probed)
    )
    # FILTERED ANN (pre-filter, never post-filter): the predicate and
    # the id semi-join restrict the candidate set BEFORE any scoring,
    # so the returned top-k is the exact filtered top-k of the probed
    # cells — a post-filter of an unfiltered top-k would return < k
    # rows whenever the filter is selective. `where` references the
    # index's own columns (id, cell, and any attr_cols stored at
    # build), so Catalyst pushes it into the probed-cell parquet scan
    # (PushedFilters) on top of the cell partition pruning; both the
    # ADC candidate stage and the exact-rerank fetch reuse the
    # filtered `idx`, so the filter holds through rerank too.
    if where is not None:
        idx = idx.filter(F.expr(where))
    if allowed_ids is not None:
        # bounded id sets (ACLs, candidate lists) broadcast; a
        # corpus-scale filter belongs in `where` over attr columns
        idx = idx.join(
            F.broadcast(allowed_ids.select(id_col).dropDuplicates([id_col])),
            id_col,
            "left_semi",
        )
    # upsert-enabled index: fold tombstones before ANY scoring — both
    # the ADC candidate stage and the exact-rerank fetch reuse `idx`,
    # so deleted/superseded rows never reach a shortlist or a rerank
    idx = _fold_tombstones(idx, *_tombstones_frame(spark, path, meta), id_col)
    dot = F.aggregate(
        F.zip_with("q_v", vec_col, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if use_pq:
        adc = _pq_adc_udf(
            meta["pq"]["codebooks"], centroids, meta["pq"].get("rotation")
        )
        cand = idx.select(id_col, "cell", "norm", "pq_codes").join(
            F.broadcast(q_cells), "cell"
        )
        if exclude_self:
            cand = cand.filter(F.col(id_col) != F.col("q_id"))
        cand = (
            cand.withColumn(
                "adc_cosine",
                adc("q_v", "cell", "pq_codes")
                / (F.col("q_norm") * F.col("norm")),
            )
            .select("q_id", id_col, "adc_cosine")
            .dropDuplicates(["q_id", id_col])
        )
        if rerank < 1:
            # codes-only serving: the ADC approximation IS the score
            scored = cand.select(
                "q_id", id_col, F.col("adc_cosine").alias("cosine")
            )
        else:
            wa = Window.partitionBy("q_id").orderBy(
                F.col("adc_cosine").desc(), F.col(id_col)
            )
            shortlist = (
                cand.withColumn("__r", F.row_number().over(wa))
                .filter(F.col("__r") <= rerank * k)
                .select("q_id", id_col)
            )
            # exact rerank: survivors only survive the join; the scan
            # itself re-reads the probed cells' vector column once per
            # query BATCH (amortized — see docstring)
            scored = (
                idx.select(id_col, vec_col, "norm")
                .join(F.broadcast(shortlist), id_col)
                .join(F.broadcast(q.select("q_id", "q_v", "q_norm")), "q_id")
                .withColumn("cosine", dot / (F.col("q_norm") * F.col("norm")))
                .select("q_id", id_col, "cosine")
                .dropDuplicates(["q_id", id_col])
            )
    else:
        scored = idx.join(F.broadcast(q_cells), "cell").withColumn(
            "cosine", dot / (F.col("q_norm") * F.col("norm"))
        )
        if exclude_self:
            scored = scored.filter(F.col(id_col) != F.col("q_id"))
        scored = scored.select("q_id", id_col, "cosine").dropDuplicates(
            ["q_id", id_col]
        )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), id_col, "rank", "cosine")
    )


def ivf_compact(
    spark,
    path: str,
    max_files_per_cell: int = 8,
    rows_per_file: int = 250_000,
    lock_timeout_s: float = 600.0,
    sweep_min_age_s: float = 0.0,
    fold_all: bool = False,
) -> dict:
    """Compact a persisted IVF index's file layout without retraining
    or re-assigning: the maintenance step between appends and the
    drift-triggered rebuild.

    Every ``ivf_append`` adds >= 1 file per touched cell (parquet
    append never rewrites prior files), so a busy index accumulates
    files — after N append batches a hot cell holds ~N small files,
    and at object-store scale the listing + per-file open overhead
    creeps back into warm-query cost (the very failure the build-time
    write clustering fixed, re-introduced one append at a time). A
    REBUILD fixes it but pays quantizer training plus the O(corpus)
    nearest-centroid assignment matmul; compaction instead reads the
    index AS IS (the cell column is already materialized — no Arrow
    UDF anywhere in the plan), reclusters by (cell, per-cell salt from
    the sidecar counts), and rewrites — scan + shuffle + write, all
    JVM-side. Results are BIT-identical before/after (same rows, same
    counts, same centroids; only the file layout changes) and PQ code
    columns ride along untouched.

    PER-CELL, not whole-index (advisor r9): only the over-threshold
    cells are scanned and rewritten — ``cell IN (over)`` on the
    partition column prunes the cold cells' directories before any
    file opens — and the cold cells' existing parquet files are
    HARD-LINKED into the new generation (same inode, zero bytes
    copied; the object-store analog is re-listing the same immutable
    objects in the new manifest). One fragmenting hot cell costs one
    hot-cell rewrite, not a full-corpus pass; ``cells_rewritten`` /
    ``cells_linked`` in the returned stats show the split.

    Commit is a GENERATION-POINTER flip, not a directory rename pair
    (verdict r9 ask #4): the new layout lands complete at
    ``{path}/index.gNNNNNN``, then ONE atomic sidecar rename
    (``_write_ivf_meta``) repoints ``index_dir`` at it. Readers
    resolve through the sidecar (``ivf_index_dir``), so they observe
    either the old complete generation or the new one — there is no
    window where the live directory is absent (the gap the old
    two-rename swap had). The displaced generation is kept on disk
    until the NEXT compaction commits (readers holding the previous
    sidecar get a full compact-cycle grace window; posix open-fd
    semantics cover anyone mid-read beyond that), then swept. EVERY
    sweep — the entry sweep, which runs on each call including no-ops
    to collect orphan staging dirs, and the post-flip sweep of the
    generation two flips back — additionally honors
    ``sweep_min_age_s`` (advisor r10): a generation directory younger
    than that many seconds (by dir mtime) is left in place, so
    back-to-back compactions (a scheduler retry right after a flip)
    cannot delete a directory a reader that loaded the sidecar moments
    earlier is still listing; a later call collects it once old
    enough. Default 0.0 keeps the pure one-cycle policy; deployments
    with long-running readers should set it comfortably above the
    slowest reader's scan time (e.g. 900). A reader that outlives BOTH
    graces gets a clear ``IvfStaleGeneration`` from ``ivf_index_dir``,
    never a bare FileNotFoundError. A crash
    BEFORE the sidecar flip leaves an orphan staging dir the next
    compaction sweeps; a crash AFTER it is already committed — there
    is no torn state to repair. Pre-pointer layouts torn by the OLD
    swap (live dir missing, ``index.old``/``index.compact`` present)
    are repaired on entry under the lock, completing or rolling back
    the interrupted rename pair (advisor r9); a roll-FORWARD repair
    additionally PARKS the stranded ``index.old`` (the displaced
    generation in-flight readers may still hold) in the sidecar's
    grace slot instead of letting the same call's entry sweep delete
    it (advisor r10).

    On an UPSERT-ENABLED index (``build_ivf_index(enable_upsert=True)``)
    compaction additionally MATERIALIZES tombstones: every rewritten
    cell is tombstone-folded (deleted/superseded rows physically
    dropped, the LSM compaction contract), the sidecar records the
    folded writer-sequence per cell, and tombstones every remaining
    cell has folded past are garbage-collected into the next tombstone
    generation (same one-atomic-sidecar-flip commit as the data
    generation — both pointers flip in the single meta write).
    ``fold_all=True`` forces a MAJOR compaction — every cell holding
    files is rewritten regardless of fragmentation — the switch that
    drains all tombstones (e.g. before snapshotting an index for
    distribution); layout-triggered (minor) compactions fold
    opportunistically and converge over time. The OPERATIONAL TRIGGER
    for the major fold is ``fold_recommended`` in the stats every
    writer returns (``ivf_delete`` / ``ivf_upsert`` / ``ivf_append``,
    r11 verdict ask #2): when live tombstones exceed ``fold_bound``
    (default 10%) of indexed rows, schedule
    ``ivf_compact(fold_all=True)`` — the delete-side mirror of
    ``rebuild_recommended`` -> ``build_ivf_index``.

    Holds the APPENDER lock throughout (compaction rewrites files an
    appender would race with; readers never take the lock).

    Returns ``{"compacted": bool, "cells_over_threshold": n,
    "cells_rewritten": n, "cells_linked": n, "files_before": n,
    "files_after": n}``; a layout already under ``max_files_per_cell``
    everywhere is a no-op (no scan, no write, sidecar untouched)."""
    import json
    import math
    import os
    import shutil
    import time

    def too_young_to_sweep(dirname: str) -> bool:
        # advisor r10: a minimum-age guard on every generation sweep —
        # dir mtime, not ctime, so a hard-link-populated generation's
        # age is when its files landed, not when an attr changed
        if sweep_min_age_s <= 0:
            return False
        try:
            age = time.time() - os.path.getmtime(os.path.join(path, dirname))
        except OSError:
            return False  # already gone — nothing to protect
        return age < sweep_min_age_s

    def file_counts(index_dir: str) -> dict[int, int]:
        out: dict[int, int] = {}
        for d in os.listdir(index_dir):
            if d.startswith("cell="):
                out[int(d.split("=", 1)[1])] = sum(
                    1
                    for f in os.listdir(os.path.join(index_dir, d))
                    if f.endswith(".parquet")
                )
        return out

    with _ivf_append_lock(path, lock_timeout_s):
        with open(os.path.join(path, "ivf_meta.json")) as fh:
            meta = json.load(fh)
        live_name = meta.get("index_dir", "index")
        live = os.path.join(path, live_name)
        if not os.path.isdir(live):
            # torn legacy two-rename swap (pre-pointer layout crashed
            # between its renames): complete it if the staged layout
            # finished (its _SUCCESS exists), else roll back to the
            # displaced generation — data was stranded, never lost
            staged_legacy = os.path.join(path, "index.compact")
            rolled_legacy = os.path.join(path, "index.old")
            if os.path.isfile(os.path.join(staged_legacy, "_SUCCESS")):
                os.rename(staged_legacy, live)
                if os.path.isdir(rolled_legacy):
                    # roll-forward stranded the displaced generation in
                    # index.old — PARK it in the grace slot (advisor
                    # r10) so the entry sweep below grants it the same
                    # one-cycle window a normal flip would, instead of
                    # deleting it out from under in-flight readers
                    meta["prev_index_dir"] = "index.old"
                    _write_ivf_meta(path, meta)
            elif os.path.isdir(rolled_legacy):
                os.rename(rolled_legacy, live)
            else:
                raise FileNotFoundError(
                    f"ivf_compact: live index dir {live} missing and no "
                    "index.compact/index.old to repair from"
                )
        # sweep generations the pointer no longer protects: anything
        # index-shaped that is neither live nor the grace-window
        # predecessor (orphan staging dirs from a crashed compaction
        # land here too), unless younger than sweep_min_age_s
        prev_name = meta.get("prev_index_dir")
        up = meta.get("upsert") or {}
        tomb_keep = (up.get("tombstones_dir"), up.get("prev_tombstones_dir"))
        for d in os.listdir(path):
            if (
                (d == "index" or d.startswith("index."))
                and d not in (live_name, prev_name)
                and not too_young_to_sweep(d)
            ):
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
            # tombstone generations follow the same pointer/grace/sweep
            # lifecycle as index generations (an upsert-less sidecar
            # keeps none, so a rebuild without enable_upsert strands
            # its predecessor's store here for exactly one grace pass)
            if (
                (d == "tombstones" or d.startswith("tombstones."))
                and d not in tomb_keep
                and not too_young_to_sweep(d)
            ):
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        before = file_counts(live)
        counts = {int(k): int(v) for k, v in meta.get("cell_counts", {}).items()}
        # A cell is over threshold only if compaction could IMPROVE it:
        # the achievable layout is ceil(cell_rows / rows_per_file) files,
        # so a hot cell already at its row-bound file count must not
        # trip the gate — otherwise a scheduler running ivf-compact
        # periodically would pay a rewrite on every call without ever
        # converging (advisor r9).
        def bound(cell: int) -> int:
            return max(
                max_files_per_cell,
                math.ceil(counts.get(cell, 0) / rows_per_file),
            )

        over_gate = {c for c, n in before.items() if n > bound(c)}
        # major compaction: rewrite every cell holding files so the
        # tombstone fold reaches the whole corpus in one pass
        over = set(before) if fold_all else over_gate
        if not over:
            return {
                "compacted": False,
                "cells_over_threshold": 0,
                "cells_rewritten": 0,
                "cells_linked": 0,
                "files_before": sum(before.values()),
                "files_after": sum(before.values()),
            }
        next_name = _next_gen_name(live_name)
        staged = os.path.join(path, next_name)
        if os.path.isdir(staged):  # crashed prior attempt, uncommitted
            shutil.rmtree(staged)
        salts = [
            (cell, max(1, round(counts.get(cell, 0) / rows_per_file)))
            for cell in sorted(over)
        ]
        idx = spark.read.parquet(live).filter(
            F.col("cell").isin(sorted(int(c) for c in over))
        )
        # materialize deletes into every rewritten cell (tombstone
        # reads are consistent for the whole call: this writer holds
        # the appender lock, so no delete can land mid-compact)
        tomb, n_tomb = _tombstones_frame(spark, path, meta)
        folding = tomb is not None
        if folding:
            idx = _fold_tombstones(idx, tomb, n_tomb, meta["id_col"])
        clustered = _cell_salted(spark, idx, meta["id_col"], salts)
        (
            clustered.write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staged)
        )
        if folding:
            # the fold may have dropped rows: refresh the rewritten
            # cells' sidecar counts from the staged footers (column-
            # pruned, <= n_lists result rows) — a fully-dead cell
            # simply has no staged dir and counts 0
            staged_counts = {}
            if any(d.startswith("cell=") for d in os.listdir(staged)):
                staged_counts = {
                    int(r["cell"]): int(r["n"])
                    for r in spark.read.parquet(staged)
                    .groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            for cell in over:
                counts[cell] = staged_counts.get(cell, 0)
            meta["cell_counts"] = {
                str(k): v for k, v in sorted(counts.items())
            }
        linked = 0
        for d in os.listdir(live):
            if not d.startswith("cell=") or int(d.split("=", 1)[1]) in over:
                continue
            src_dir = os.path.join(live, d)
            dst_dir = os.path.join(staged, d)
            os.makedirs(dst_dir, exist_ok=True)
            for f in os.listdir(src_dir):
                if f.endswith(".parquet"):
                    try:
                        os.link(
                            os.path.join(src_dir, f), os.path.join(dst_dir, f)
                        )
                    except OSError:
                        # cross-device or no-hardlink fs: fall back to a
                        # copy (the object-store analog is re-listing
                        # the same immutable objects — still no rewrite)
                        shutil.copy2(
                            os.path.join(src_dir, f), os.path.join(dst_dir, f)
                        )
            linked += 1
        tomb_gcd = 0
        if meta.get("upsert"):
            # every rewritten cell is now folded up to the sidecar's
            # writer sequence (consistent under the appender lock)
            up = meta["upsert"]
            prev_tomb_grace = up.get("prev_tombstones_dir")
            w_seq = int(up.get("write_seq", 0))
            fs = up.setdefault("folded_seq", {})
            for cell in over:
                fs[str(cell)] = max(int(fs.get(str(cell), 0)), w_seq)
            # GC tombstones no remaining row can match: min folded
            # sequence over every cell still holding FILES in the new
            # generation is the floor below which every targeted row is
            # physically gone. Physical files, not sidecar counts
            # (reviewer r11): a crashed append can leave rows in a cell
            # the sidecar never counted — a count-based floor would GC
            # a tombstone whose target still sits in that unfolded
            # file, resurrecting the deleted row.
            live_cells = [c for c, n in file_counts(staged).items() if n > 0]
            min_folded = min(
                (int(fs.get(str(c), 0)) for c in live_cells),
                default=w_seq,
            )
            if folding and min_folded > 0:
                tomb_name = up["tombstones_dir"]
                store = spark.read.parquet(os.path.join(path, tomb_name))
                n_total = store.count()
                remaining = store.filter(F.col("__del_seq") > min_folded)
                n_rem = remaining.count()
                if n_rem < n_total:
                    # stage the surviving tombstones as the NEXT
                    # tombstone generation; the pointer flips in the
                    # same sidecar write that commits the data
                    # generation below (one atomic commit for both)
                    next_tomb = _next_tomb_name(tomb_name)
                    staged_tomb = os.path.join(path, next_tomb)
                    if os.path.isdir(staged_tomb):
                        shutil.rmtree(staged_tomb)
                    if n_rem:
                        (
                            remaining.repartition(
                                max(1, math.ceil(n_rem / 5_000_000))
                            )
                            .write.mode("overwrite")
                            .parquet(staged_tomb)
                        )
                    else:
                        os.makedirs(staged_tomb, exist_ok=True)
                    up["prev_tombstones_dir"] = tomb_name
                    up["tombstones_dir"] = next_tomb
                    up["n_tombstones"] = int(n_rem)
                    tomb_gcd = int(n_total - n_rem)
            if tomb_gcd == 0 and prev_tomb_grace:
                # the displaced tombstone store has now had its full
                # one-compact-cycle grace: release the slot so the NEXT
                # call's entry sweep collects the directory (mirrors
                # the index generation's prev -> swept lifecycle)
                up.pop("prev_tombstones_dir", None)
        if "row_schema" not in meta:
            # legacy sidecar (pre-r12 build): record the row schema so
            # readers can serve an EMPTY generation (all rows
            # tombstoned) as a typed zero-row frame instead of failing
            # schema inference. `clustered` is the exact row shape the
            # staged files carry.
            meta["row_schema"] = clustered.schema.json()
        # COMMIT: one atomic sidecar rename flips the generation; the
        # displaced generation moves into the grace slot and the slot's
        # previous occupant (now two generations back) is swept
        meta["prev_index_dir"] = live_name
        meta["index_dir"] = next_name
        _write_ivf_meta(path, meta)
        if (
            prev_name
            and prev_name not in (live_name, next_name)
            and not too_young_to_sweep(prev_name)
        ):
            shutil.rmtree(os.path.join(path, prev_name), ignore_errors=True)
        after = file_counts(staged)
        stats = {
            "compacted": True,
            "cells_over_threshold": len(over_gate),
            "cells_rewritten": len(over),
            "cells_linked": linked,
            "files_before": sum(before.values()),
            "files_after": sum(after.values()),
        }
        if meta.get("upsert"):
            stats["tombstones_gcd"] = tomb_gcd
            stats["tombstones_remaining"] = int(
                meta["upsert"].get("n_tombstones", 0)
            )
        return stats


def ivf_snapshot(
    spark,
    path: str,
    dest: str,
    compact_first: bool = False,
    lock_timeout_s: float = 600.0,
) -> dict:
    """Export a CONSISTENT, self-contained snapshot of a persisted IVF
    index to ``dest`` — the distribution / backup verb.

    Under the appender lock (a concurrent writer could otherwise flip
    the generation or land a tombstone mid-copy, leaving the copied
    data and sidecar describing different states), the live data
    generation and — on an upsert-enabled index — the live tombstone
    store are HARD-LINKED into ``dest`` (same inode, zero bytes
    copied; cross-device falls back to a file copy; the object-store
    analog is copying the manifest and re-listing the same immutable
    objects), and a fresh sidecar is written whose generation pointer
    is plain ``index``/``tombstones``. Cost is O(file count), not
    O(bytes) — at 100 TB the snapshot is a metadata operation.

    The snapshot is a NEW LINEAGE: ``prev_*`` grace slots and the
    streaming replay guard (``last_stream_batch``/``last_stream_id``)
    are dropped — pointing the OLD checkpoint's stream at the snapshot
    would misclassify its fresh batches as replays, so a snapshot-fed
    stream must start its own checkpoint. Everything that defines
    serving semantics carries over verbatim: centroids, PQ codebooks /
    rotation, attr_cols, row_schema, cell_counts, and the upsert
    block's ``write_seq``/``folded_seq``/``n_tombstones`` — readers
    fold the copied tombstones exactly as on the source, and future
    writers on the snapshot continue the writer sequence, so the
    strict ``__del_seq > __seq`` contract stays valid. The source is
    untouched (unless ``compact_first=True``, which runs
    ``ivf_compact(fold_all=True)`` on the SOURCE first — the
    distribution prep that ships a tombstone-free snapshot at the
    cost of one source compaction). ``dest`` must not already hold an
    index (FileExistsError — a snapshot never silently overwrites).

    Returns ``{"files_linked": n, "tombstone_files": n,
    "n_tombstones": sidecar estimate, "dest": dest}``."""
    import json
    import os
    import shutil

    if compact_first:
        ivf_compact(spark, path, fold_all=True, lock_timeout_s=lock_timeout_s)
    with _ivf_append_lock(path, lock_timeout_s):
        with open(os.path.join(path, "ivf_meta.json")) as fh:
            meta = json.load(fh)
        if os.path.exists(os.path.join(dest, "ivf_meta.json")):
            raise FileExistsError(
                f"ivf_snapshot: {dest} already holds an index sidecar — "
                "snapshots never overwrite; pick a fresh directory"
            )
        os.makedirs(dest, exist_ok=True)

        def _link_tree(src_dir: str, dst_dir: str) -> int:
            n = 0
            for walk_root, _dirs, files in os.walk(src_dir):
                rel = os.path.relpath(walk_root, src_dir)
                tgt = dst_dir if rel == "." else os.path.join(dst_dir, rel)
                os.makedirs(tgt, exist_ok=True)
                for f in files:
                    if not (f.endswith(".parquet") or f == "_SUCCESS"):
                        continue
                    s = os.path.join(walk_root, f)
                    d = os.path.join(tgt, f)
                    try:
                        os.link(s, d)
                    except OSError:
                        shutil.copy2(s, d)
                    n += 1
            return n

        live = os.path.join(path, meta.get("index_dir", "index"))
        n_files = _link_tree(live, os.path.join(dest, "index"))
        new_meta = {
            k: v
            for k, v in meta.items()
            if k
            not in ("prev_index_dir", "last_stream_batch", "last_stream_id")
        }
        new_meta["index_dir"] = "index"
        n_tomb_files = 0
        if meta.get("upsert"):
            up = dict(meta["upsert"])
            up.pop("prev_tombstones_dir", None)
            src_tomb = os.path.join(
                path, meta["upsert"].get("tombstones_dir", "tombstones")
            )
            dst_tomb = os.path.join(dest, "tombstones")
            if os.path.isdir(src_tomb):
                n_tomb_files = _link_tree(src_tomb, dst_tomb)
            else:
                os.makedirs(dst_tomb, exist_ok=True)
            up["tombstones_dir"] = "tombstones"
            new_meta["upsert"] = up
        _write_ivf_meta(dest, new_meta)
    return {
        "files_linked": n_files,
        "tombstone_files": n_tomb_files,
        "n_tombstones": int((meta.get("upsert") or {}).get("n_tombstones", 0)),
        "dest": dest,
    }


def ivf_verify(spark, path: str, repair: bool = False) -> dict:
    """Audit (and optionally repair) a persisted IVF index's sidecar
    bookkeeping against the index itself.

    ``ivf_append`` writes the parquet batch first and the sidecar
    second; a crash between the two leaves the index CORRECT (queries
    scan whatever the cells hold) but the sidecar's cumulative cell
    counts stale — the drift guard would then under-count skew. This
    recomputes per-cell counts from the index with one groupBy over the
    (cell) partition column (column-pruned: no vector bytes read),
    reports the diff, and with ``repair=True`` rewrites the sidecar
    atomically.

    The audit resolves the live data dir through the sidecar's
    generation pointer (``ivf_index_dir``). A PRE-pointer layout torn
    by the old two-rename swap (live dir missing, ``index.old`` /
    ``index.compact`` stranded) is reported via ``torn_swap: True``
    and, with ``repair=True``, repaired by completing or rolling back
    the interrupted rename pair before the count audit runs.

    Returns ``{"consistent": bool, "consistent_after": bool, "diff":
    {cell: (sidecar, actual)}, "repaired": bool, "lock_held": pid|None,
    "torn_swap": bool}``.
    ``consistent`` is the PRE-repair state (what the audit found);
    ``consistent_after`` is the post-call state — True whenever the
    sidecar now matches the index, i.e. it was already consistent OR the
    repair rewrote it. Callers gating on index health must check
    ``consistent_after``; checking only ``consistent`` would treat a
    successfully repaired index as broken. ``lock_held`` surfaces a
    present ``ivf_meta.lock`` (an in-flight or crashed appender) so
    operators can see contention — the READ-ONLY audit never takes or
    breaks the lock; both ``repair=True`` branches (torn-swap layout
    repair and the count rewrite) are WRITES and serialize behind the
    appender lock like every other writer, re-reading the sidecar
    inside it so a racing appender's counts or stream watermark are
    never regressed."""
    import json
    import os

    with open(os.path.join(path, "ivf_meta.json")) as fh:
        meta = json.load(fh)
    lock_held = None
    try:
        with open(os.path.join(path, "ivf_meta.lock")) as fh:
            lock_held = int(json.load(fh).get("pid", -1))
    except (OSError, ValueError):
        pass
    live = ivf_index_dir(path, meta)
    torn = not os.path.isdir(live)
    if torn and repair:
        # layout repair MUTATES writer-owned state, so it serializes
        # behind the same appender lock ivf_compact's entry repair
        # holds (reviewer r10: two unserialized repairers racing the
        # same rename pair leave a half-repaired layout); the
        # read-only audit path below stays lock-free
        with _ivf_append_lock(path, 600.0):
            if not os.path.isdir(live):  # re-check under the lock
                staged_legacy = os.path.join(path, "index.compact")
                rolled_legacy = os.path.join(path, "index.old")
                if os.path.isfile(os.path.join(staged_legacy, "_SUCCESS")):
                    os.rename(staged_legacy, live)
                    if os.path.isdir(rolled_legacy):
                        # park the roll-forward's stranded displaced
                        # generation in the grace slot (advisor r10) so
                        # the next compaction's entry sweep grants it
                        # the normal one-cycle window; re-read the
                        # sidecar under the lock before the RMW
                        with open(os.path.join(path, "ivf_meta.json")) as fh:
                            fresh = json.load(fh)
                        fresh["prev_index_dir"] = "index.old"
                        _write_ivf_meta(path, fresh)
                elif os.path.isdir(rolled_legacy):
                    os.rename(rolled_legacy, live)
                else:
                    raise FileNotFoundError(
                        f"ivf_verify: live index dir {live} missing and no "
                        "index.compact/index.old to repair from"
                    )
    elif torn:
        return {
            "consistent": False,
            "consistent_after": False,
            "diff": {},
            "repaired": False,
            "lock_held": lock_held,
            "torn_swap": True,
        }
    actual = {
        int(r["cell"]): int(r["n"])
        for r in _scan_index(spark, live, meta)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    recorded = {int(k): v for k, v in meta.get("cell_counts", {}).items()}
    diff = {
        cell: (recorded.get(cell, 0), actual.get(cell, 0))
        for cell in set(recorded) | set(actual)
        if recorded.get(cell, 0) != actual.get(cell, 0)
    }
    repaired = False
    if diff and repair:
        # sidecar RMW: serialize behind the appender lock and RE-READ
        # the sidecar inside it — writing the stale top-of-function
        # snapshot could regress a racing appender's freshly recorded
        # counts or stream watermark (same hazard class the appender
        # lock exists for)
        with _ivf_append_lock(path, 600.0):
            with open(os.path.join(path, "ivf_meta.json")) as fh:
                fresh = json.load(fh)
            fresh["cell_counts"] = {
                str(k): v for k, v in sorted(actual.items())
            }
            _write_ivf_meta(path, fresh)
        repaired = True
    out = {
        "consistent": not diff and not torn,
        "consistent_after": not diff or repaired,
        "diff": diff,
        "repaired": repaired or (torn and repair),
        "lock_held": lock_held,
        "torn_swap": torn,
    }
    if meta.get("upsert"):
        # merge-on-read health: how many distinct ids are tombstoned
        # (reads the live tombstone generation, so a crash-torn delete
        # whose sidecar bump never landed is still counted) — the
        # audit's cell counts above are PHYSICAL rows by design
        # (unfolded cells hold their dead rows on disk)
        tomb, _ = _tombstones_frame(spark, path, meta)
        out["tombstoned_ids"] = int(tomb.count()) if tomb is not None else 0
        out["n_tombstones_recorded"] = int(
            meta["upsert"].get("n_tombstones", 0)
        )
    return out


def _train_pq_codebooks(
    vectors: "np.ndarray", m_sub: int, ksub: int, seed: int
) -> list["np.ndarray"]:
    """Per-subspace k-means codebooks (the product quantizer), trained
    on the same bounded driver sample as the coarse quantizer. dim must
    be divisible by m_sub."""
    dim = vectors.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    return [
        _lloyd(
            np.ascontiguousarray(vectors[:, mi * dsub : (mi + 1) * dsub]),
            ksub,
            seed + mi,
        )
        for mi in range(m_sub)
    ]


def _train_opq(
    residuals: "np.ndarray",
    m_sub: int,
    ksub: int,
    seed: int,
    iters: int = 8,
) -> tuple["np.ndarray", list["np.ndarray"]]:
    """OPQ (Ge et al., CVPR 2013): learn an orthogonal rotation R that
    minimizes PQ reconstruction error before subspace coding, by
    alternating (a) codebook training on the rotated sample and (b) the
    orthogonal-Procrustes solve R = U·Vt from svd(X^T · recon). PQ
    splits dims into independent subspaces, so correlated/anisotropic
    dimensions (the normal case for learned embeddings) waste code
    budget — the rotation decorrelates and balances variance across
    subspaces, buying recall at the SAME bytes per code. Runs entirely
    driver-side on the bounded training sample (dim x dim matrices;
    dim<=1024 is trivial numpy work), like the coarse quantizer and the
    codebooks themselves.

    Returns (R, codebooks) where codes quantize ``x @ R`` and decode as
    ``recon_rot @ R.T`` (row-vector convention; R orthogonal)."""
    dim = residuals.shape[1]
    rot = np.eye(dim)
    books: list[np.ndarray] = []
    dsub = dim // m_sub
    for _ in range(max(1, iters)):
        x = residuals @ rot
        books = _train_pq_codebooks(x, m_sub, ksub, seed)
        recon = np.empty_like(x)
        for mi in range(m_sub):
            sub = x[:, mi * dsub : (mi + 1) * dsub]
            cb = books[mi]
            d = -2.0 * (sub @ cb.T) + (cb**2).sum(1)[None, :]
            recon[:, mi * dsub : (mi + 1) * dsub] = cb[d.argmin(1)]
        u, _, vt = np.linalg.svd(residuals.T @ recon)
        rot = u @ vt
    books = _train_pq_codebooks(residuals @ rot, m_sub, ksub, seed)
    return rot, books


def _pq_encode_udf(codebooks: list, centroids: list, rotation: list | None = None):
    """Arrow-vectorized RESIDUAL PQ encoder: (vector, cell) -> ``binary``
    of m_sub uint8 subspace codes (ksub <= 256 keeps one code one byte —
    the 64x-at-dim-64 compression that makes the persisted ADC probe
    read m_sub bytes instead of 8·dim).

    RESIDUAL, not raw (IVFADC, Jegou et al. 2011 §IV): codes quantize
    ``v - centroid[cell]``. This is what makes ADC usable — encoding raw
    vectors was measured unusable on the 8M soak corpus (reconstruction
    residual ~25% of the vector norm swamped the 0.1-cosine margin of
    PLANTED near-duplicates: ADC planted-recall 0.0, raw path 1.0,
    BENCH_LOCAL_r09 first pq pass). The cell centroid carries the
    coarse position; the codebooks only cover the within-cell residual
    range, so the same 8 bytes resolve ~n_lists x finer structure. One
    batched matmul-argmin per subspace; codebooks + centroids ride the
    task closure (tiny)."""
    book = np.stack([np.asarray(cb, dtype=np.float64) for cb in codebooks])
    cents = np.asarray(centroids, dtype=np.float64)
    rot = None if rotation is None else np.asarray(rotation, dtype=np.float64)
    m_sub, ksub, dsub = book.shape
    if ksub > 256:
        raise ValueError(f"pq ksub {ksub} > 256 does not fit uint8 codes")

    @F.pandas_udf("binary")
    def _encode(vs: pd.Series, cell: pd.Series) -> pd.Series:
        x = np.asarray(vs.tolist(), dtype=np.float64)  # (batch, dim)
        if x.size == 0:
            return pd.Series([], dtype=object)
        x = x - cents[np.asarray(cell, dtype=np.int64)]  # residuals
        if rot is not None:  # OPQ: codes quantize the ROTATED residual
            x = x @ rot
        codes = np.empty((len(x), m_sub), dtype=np.uint8)
        for mi in range(m_sub):
            sub = x[:, mi * dsub : (mi + 1) * dsub]
            cb = book[mi]  # (ksub, dsub)
            # ||s||^2 is row-constant for the argmin; -2 s.c + c.c orders
            d = -2.0 * (sub @ cb.T) + (cb**2).sum(1)[None, :]
            codes[:, mi] = d.argmin(1)
        return pd.Series([c.tobytes() for c in codes])

    return _encode


def _pq_adc_udf(codebooks: list, centroids: list, rotation: list | None = None):
    """Arrow-vectorized asymmetric-distance scorer for PERSISTED
    residual codes: (query vector, cell, binary codes) -> reconstructed
    dot product q·(centroid[cell] + recon(codes)). Candidates are
    reconstructed from the closure codebooks and fused into one
    (batch, dim) elementwise dot — O(dim) per candidate at memory
    bandwidth, no raw-vector I/O. With an OPQ ``rotation`` the codes
    live in the rotated residual space; decoding applies ``@ R.T``
    (orthogonal inverse) before re-adding the cell centroid."""
    book = np.stack([np.asarray(cb, dtype=np.float64) for cb in codebooks])
    cents = np.asarray(centroids, dtype=np.float64)
    rot_t = (
        None
        if rotation is None
        else np.asarray(rotation, dtype=np.float64).T
    )
    m_sub = book.shape[0]

    @F.pandas_udf("double")
    def _adc(qv: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        qm = np.asarray(qv.tolist(), dtype=np.float64)  # (batch, dim)
        if qm.size == 0:
            return pd.Series([], dtype=float)
        cm = np.frombuffer(b"".join(codes.tolist()), dtype=np.uint8).reshape(
            len(codes), m_sub
        )
        recon = np.concatenate(
            [book[mi][cm[:, mi]] for mi in range(m_sub)], axis=1
        )  # (batch, dim)
        if rot_t is not None:
            recon = recon @ rot_t
        recon = recon + cents[np.asarray(cell, dtype=np.int64)]
        return pd.Series((recon * qm).sum(axis=1))

    return _adc


def _residual_sample(
    vecs: "np.ndarray", centroids: list, assign: "np.ndarray | None" = None
) -> "np.ndarray":
    """Training residuals for the PQ codebooks: each sample vector minus
    its nearest coarse centroid (the distribution the codes quantize).
    Pass a precomputed ``assign`` to reuse the caller's assignment."""
    if assign is None:
        assign = _assign_nearest(vecs, centroids)
    return vecs - np.asarray(centroids, dtype=np.float64)[assign]


def cosine_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 8,
    n_probe: int = 3,
    m_sub: int = 8,
    ksub: int = 16,
    rerank: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via IVF + product quantization with
    asymmetric-distance scoring (IVFADC, Jegou et al. 2011) and exact
    rerank.

    The 100-TB memory story on top of ``cosine_topk_ivf``: the scanned
    index row is ``(id, cell, norm, m_sub uint codes)`` — m_sub bytes of
    payload instead of 4·dim (64× smaller at dim=64/m=8) — so the
    candidate scan streams the compressed index and NEVER touches raw
    vectors. Raw vectors are read back (hash join on id) only for the
    exact rerank of the per-query top rerank·k ADC survivors.

    Train: both quantizers (coarse + per-subspace PQ codebooks) fit on
    one bounded driver sample (FAISS convention; ``_hash_sample`` keeps
    the fetch's driver traffic independent of partition count). Encode: one vectorized Arrow UDF per batch
    does the m_sub argmin matmuls (the documented dense-linear-algebra
    exception to no-Python-in-hot-path). Query: probe n_probe nearest
    cells; ADC scores come from reconstructing each candidate from the
    plan-closure codebooks and one fused (batch,dim) elementwise dot —
    per-candidate cost O(dim) at memory bandwidth, no raw-vector I/O.

    Returns (query_id, <id_col>, rank, cosine) — cosine is EXACT for
    returned rows (rerank recomputes it from raw vectors).
    """
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")

    max_train = max(256 * n_lists, 2048)
    # bounded-driver-traffic sample, identical set to the old TakeOrdered
    # (see _hash_sample: the PQ path had the same partitions x k defect)
    vecs = _hash_sample(c, max_train)
    centroids = [list(map(float, ctr)) for ctr in _lloyd(vecs, n_lists, seed)]
    # RESIDUAL codebooks (IVFADC proper, Jegou 2011 §IV) — raw-vector
    # codebooks measured unusable at 8M (see _pq_encode_udf)
    codebooks = [
        cb.tolist()
        for cb in _train_pq_codebooks(
            _residual_sample(vecs, centroids), m_sub, ksub, seed
        )
    ]
    encode = _pq_encode_udf(codebooks, centroids)
    adc = _pq_adc_udf(codebooks, centroids)

    # the compressed index: ids, cells, norms, codes — no raw vectors
    c_idx = c.withColumn("cell", _nearest_cells(centroids, "c_v", 1)[0]).select(
        "c_id", "cell", "c_norm", encode("c_v", "cell").alias("codes")
    )
    q_cells = q.withColumn(
        "cell", F.explode(_nearest_cells(centroids, "q_v", n_probe))
    )

    cand = (
        c_idx.join(F.broadcast(q_cells), "cell")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn(
            "adc_cosine",
            adc("q_v", "cell", "codes") / (F.col("q_norm") * F.col("c_norm")),
        )
        .select("q_id", "c_id", "adc_cosine")
        .dropDuplicates(["q_id", "c_id"])
    )
    wa = Window.partitionBy("q_id").orderBy(F.col("adc_cosine").desc(), F.col("c_id"))
    shortlist = (
        cand.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= rerank * k)
        .select("q_id", "c_id")
    )

    dot = F.aggregate(
        F.zip_with("q_v", "c_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        shortlist.join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
        .select("q_id", "c_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias(id_col),
            "rank",
            "cosine",
        )
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_table: int = 4,
    num_tables: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via multi-table random-hyperplane LSH.

    `num_tables` independent hash tables, each bucketing on
    `bits_per_table` hyperplane sign bits. A query's candidates are the
    union over tables of its bucket mates; candidates are exactly
    reranked. For a pair at angle θ (per-plane agreement p = 1-θ/π),
    recall = 1-(1-p^bits)^tables — tunable: more tables → recall, more
    bits → precision/cost. The bucket join replaces the full cross
    product; the corpus is replicated num_tables× as (table, bucket, id)
    index rows (ids + buckets only — vectors join back in for the rerank
    at candidate cardinality, not index cardinality).
    """
    hp = hyperplanes(dim, bits_per_table * num_tables, seed)
    tables = [hp[t * bits_per_table : (t + 1) * bits_per_table] for t in range(num_tables)]

    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")
    c_idx = c.select(
        "c_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        rp_signature(F.col("c_v"), tables[t]).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("c_id", "tb.tbl", "tb.bucket")
    q_idx = q.select(
        "q_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        rp_signature(F.col("q_v"), tables[t]).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("q_id", "tb.tbl", "tb.bucket")

    cand = (
        c_idx.join(F.broadcast(q_idx), ["tbl", "bucket"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id")
        .dropDuplicates(["q_id", "c_id"])
    )
    dot = F.aggregate(
        F.zip_with("q_v", "c_v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cand.join(c, "c_id")
        .join(F.broadcast(q), "q_id")
        .withColumn("cosine", dot / (F.col("q_norm") * F.col("c_norm")))
        .select("q_id", "c_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias(id_col),
            "rank",
            "cosine",
        )
    )


def embedding_space_report(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label embedding-space audit: class centroids + cohesion
    stats — the embedding-table data-quality report run before trusting
    vectors for semantic dedup / ANN / clustering (a label whose
    members barely correlate with their own centroid signals a broken
    encoder or mislabeled data; cross-checks the label column the same
    way dq_report cross-checks scalar columns).

    Returns (label, n_vectors, mean_centroid_cos, min_centroid_cos,
    max_centroid_cos), cosines rounded to 4 decimals (the cross-engine
    determinism contract).

    Scale shape: centroids via posexplode + partial-aggregated
    groupBy((label, pos)) — shuffle volume is |labels| x dim, never
    vectors; the |labels|-row centroid table broadcasts back onto ONE
    corpus scan for the cosine fold; one final |labels|-row aggregate.
    Two corpus passes total, both map-heavy.
    """
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"), v.alias("v")
    )
    dims = base.select("lbl", F.posexplode("v").alias("pos", "x"))
    centroids = (
        dims.groupBy("lbl", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy("lbl")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("lbl", F.transform("pc", lambda s: s["c"]).alias("cv"))
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    # centroid norm computed ONCE per label on the |labels|-row table
    # (an O(dim) fold per corpus row otherwise), and try_divide so a
    # zero-norm member or a degenerate all-cancelling centroid reports
    # a null cosine instead of crashing the audit on exactly the broken
    # data it exists to surface (ANSI DIVIDE_BY_ZERO)
    centroids = centroids.withColumn(
        "nc", F.sqrt(F.aggregate("cv", F.lit(0.0), lambda a, x: a + x * x))
    )
    scored = base.join(F.broadcast(centroids), "lbl").withColumn(
        "cos", F.round(F.try_divide(dot, nv * F.col("nc")), 4)
    )
    return scored.groupBy(F.col("lbl").alias(label_col)).agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("cos"), 4).alias("mean_centroid_cos"),
        F.min("cos").alias("min_centroid_cos"),
        F.max("cos").alias("max_centroid_cos"),
    )

"""Connected-components clustering tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.clustering import (
    cluster_representatives,
    connected_components,
)


def test_transitive_chain_collapses(spark):
    # A-B, B-C, C-D → one cluster; E-F separate
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a BIGINT, id_b BIGINT"
    )
    comps = connected_components(pairs)
    got = {r["id"]: r["cluster"] for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    reps = {
        r["cluster"]: (r["keep_id"], r["n_members"])
        for r in cluster_representatives(comps).collect()
    }
    assert reps == {1: (1, 4), 10: (10, 2)}


def test_long_path_converges(spark):
    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a BIGINT, id_b BIGINT"
    )
    comps = connected_components(pairs)
    assert {r["cluster"] for r in comps.collect()} == {0}


def test_clusters_on_planted_near_dups(spark):
    from dog_data_pipeline_spark.operators.dedup import jaccard_pairs
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    pairs = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    comps = connected_components(pairs)
    reps = cluster_representatives(comps)
    n_pairs = pairs.count()
    n_nodes = comps.count()
    n_clusters = reps.count()
    assert n_clusters < n_nodes  # something actually merged
    # every cluster representative is a member of its own cluster
    member = comps.select(F.col("id"), F.col("cluster").alias("member_cluster"))
    joined = reps.join(member, reps.keep_id == member.id)
    assert joined.filter(F.col("member_cluster") != F.col("cluster")).count() == 0
    assert n_pairs >= n_nodes - n_clusters  # spanning-forest lower bound


def test_iterative_path_matches_union_find(spark):
    # force the distributed label-propagation branch and check it agrees
    # with the driver-side union-find on the same graph
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        "id_a LONG, id_b LONG",
    )
    fast = {(r["id"], r["cluster"]) for r in connected_components(pairs).collect()}
    slow = {
        (r["id"], r["cluster"])
        for r in connected_components(pairs, small_threshold=0).collect()
    }
    assert fast == slow
    assert {c for _, c in fast} == {1, 10, 20}


def test_cluster_best_representatives_argmax_and_ties(spark):
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.operators.clustering import (
        cluster_best_representatives,
    )

    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], ["id", "cluster"]
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)], ["id", "quality"]
    )
    out = {
        r.cluster: (r.keep_id, r.keep_score, r.n_members)
        for r in cluster_best_representatives(comps, scores).collect()
    }
    # argmax quality; tie between ids 2 and 3 -> min id wins
    assert out[1] == (2, 0.9, 3)
    assert out[10] == (10, 0.1, 2)


def test_cluster_best_representatives_unscored_and_duplicates(spark):
    from dog_data_pipeline_spark.operators.clustering import (
        cluster_best_representatives,
    )

    comps = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("x", 2), ("y", 2)], ["id", "cluster"]
    )
    # 'c' unscored; 'b' has duplicate rows (max wins); cluster 2 fully
    # unscored -> min id keeps with NULL score; string ids throughout
    scores = spark.createDataFrame(
        [("a", 0.4), ("b", 0.2), ("b", 0.7)], ["id", "quality"]
    )
    out = {
        r.cluster: (r.keep_id, r.keep_score, r.n_members)
        for r in cluster_best_representatives(comps, scores).collect()
    }
    assert out[1] == ("b", 0.7, 3)  # dup rows collapsed, n_members intact
    assert out[2] == ("x", None, 2)  # all-unscored cluster survives


def test_kmeans_fit_recovers_planted_blobs(spark):
    """Three well-separated 2-D blobs: 4 Lloyd iterations must reach
    blob-pure cells, non-increasing inertia, and the hash-deterministic
    init must be reproducible from the data alone."""
    from dog_data_pipeline_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        kmeans_parallel_init,
    )

    centers = [(0.0, 0.0), (100.0, 0.0), (0.0, 100.0)]
    rows = [
        (b * 50 + i, [cx + (i % 7) * 0.5, cy + (i % 5) * 0.5])
        for b, (cx, cy) in enumerate(centers)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vid INT, v ARRAY<DOUBLE>")
    fit = kmeans_fit(df, "vid", "v", k=3, iters=4, salt="t")
    assert fit["init"] == kmeans_parallel_init(df, "vid", "v", 3, salt="t")
    hist = fit["inertia"]
    assert len(hist) == 4
    assert all(b <= a + 1e-9 for a, b in zip(hist, hist[1:]))
    out = kmeans_assign(df, fit["centroids"], "vid", "v").collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vid"] // 50, set()).add(r["cell"])
    # every blob lands in exactly one cell, and the cells are distinct
    assert all(len(cells) == 1 for cells in by_blob.values())
    assert len({c for s in by_blob.values() for c in s}) == 3


def test_kmeans_fit_empty_cell_keeps_previous_centroid(spark):
    """k=3 over two distinct points: one cell can never win a member;
    its centroid must stay at its init vector instead of going NaN."""
    from dog_data_pipeline_spark.operators.clustering import kmeans_fit

    rows = [(i, [0.0, 0.0] if i % 2 else [10.0, 10.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vid INT, v ARRAY<DOUBLE>")
    fit = kmeans_fit(df, "vid", "v", k=3, iters=3, salt="t", init="hash")
    assert len(fit["centroids"]) == 3
    flat = [x for c in fit["centroids"] for x in c]
    assert all(x == x for x in flat)  # no NaN
    # at least one final centroid is an init vector carried through
    assert any(c in fit["init"] for c in fit["centroids"])


def test_kmeans_fit_invariant_under_repartition(spark):
    """Assignment cells (the discrete output) must not depend on the
    physical partitioning; float sums may differ in ulps but the
    planted margins here are huge."""
    from dog_data_pipeline_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    rows = [(i, [float(i % 4) * 50.0, 0.0]) for i in range(80)]
    df = spark.createDataFrame(rows, "vid INT, v ARRAY<DOUBLE>")
    a = kmeans_fit(df, "vid", "v", k=4, iters=3, salt="t")
    b = kmeans_fit(df.repartition(7), "vid", "v", k=4, iters=3, salt="t")
    assert a["init"] == b["init"]
    cells_a = sorted(
        (r["vid"], r["cell"])
        for r in kmeans_assign(df, a["centroids"], "vid", "v").collect()
    )
    cells_b = sorted(
        (r["vid"], r["cell"])
        for r in kmeans_assign(df, b["centroids"], "vid", "v").collect()
    )
    assert cells_a == cells_b


def _np_pagerank(edges, iterations=10, damping=0.85):
    """Independent-path reference: dense power iteration with uniform
    dangling-mass redistribution."""
    import numpy as np

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, wt in edges:
        w[idx[s], idx[d]] += wt
    ow = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dm = r[ow == 0].sum()
        contrib = np.zeros(n)
        src_mask = ow > 0
        contrib = (r[src_mask, None] * w[src_mask] / ow[src_mask, None]).sum(
            axis=0
        )
        r = (1 - damping) / n + damping * (contrib + dm / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_ring_is_uniform(spark):
    from dog_data_pipeline_spark.operators.clustering import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src STRING, dst STRING"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert set(got) == {"a", "b", "c"}
    for v in got.values():
        assert abs(v - 1.0 / 3.0) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_weighted_matches_numpy(spark):
    from dog_data_pipeline_spark.operators.clustering import pagerank

    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 2.0)]
    e = spark.createDataFrame(edges, "src STRING, dst STRING, w DOUBLE")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight_col="w", iterations=7).collect()
    }
    ref = _np_pagerank(edges, iterations=7)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])


def test_pagerank_dangling_mass_redistributed(spark):
    """b has no out-edges: its rank must be redistributed, keeping the
    total at 1 every iteration (the non-stochastic variant would leak
    mass)."""
    from dog_data_pipeline_spark.operators.clustering import pagerank

    edges = [("a", "b", 1.0), ("c", "b", 1.0), ("c", "a", 1.0)]
    e = spark.createDataFrame(edges, "src STRING, dst STRING, w DOUBLE")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight_col="w", iterations=5).collect()
    }
    ref = _np_pagerank(edges, iterations=5)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-9, (v, got[v], ref[v])


def test_pagerank_distributed_path_matches_driver_path(spark):
    """small_threshold=0 forces the Pregel loop; it must agree with the
    driver-side numpy path (including dangling handling) to 1e-9."""
    from dog_data_pipeline_spark.operators.clustering import pagerank

    edges = [("a", "b", 3.0), ("a", "c", 1.0), ("c", "a", 2.0)]  # b dangles
    e = spark.createDataFrame(edges, "src STRING, dst STRING, w DOUBLE")
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(
            e, weight_col="w", iterations=4, small_threshold=0
        ).collect()
    }
    drv = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight_col="w", iterations=4).collect()
    }
    assert set(dist) == set(drv)
    for v in drv:
        assert abs(dist[v] - drv[v]) < 1e-9, (v, dist[v], drv[v])


def test_triangle_stats_hand_checked(spark):
    from dog_data_pipeline_spark.operators.clustering import triangle_stats

    # K3 on {1,2,3} plus a pendant 3-4 and an isolated edge 5-6
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["node"]: r for r in triangle_stats(df).collect()}
    assert got[1]["n_triangles"] == 1 and got[1]["degree"] == 2
    assert got[1]["clustering_coeff"] == 1.0
    assert got[3]["degree"] == 3 and got[3]["n_triangles"] == 1
    assert abs(got[3]["clustering_coeff"] - 2 / 6) < 1e-12
    # degree-1 nodes present with coeff 0, no division blow-up
    assert got[4]["n_triangles"] == 0 and got[4]["clustering_coeff"] == 0.0
    assert got[5]["clustering_coeff"] == 0.0


def test_triangle_stats_orientation_and_dupes(spark):
    from dog_data_pipeline_spark.operators.clustering import triangle_stats

    # same triangle given with mixed orientation, duplicates, self-loop
    edges = [(2, 1), (1, 2), (3, 2), (1, 3), (7, 7)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["node"]: r for r in triangle_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    assert all(r["n_triangles"] == 1 for r in got.values())
    assert all(r["degree"] == 2 for r in got.values())

"""BM25 keyword search: postings correctness and ranking invariants on
tiny literal corpora (math checked against a hand-rolled model)."""

from __future__ import annotations

import math

from dog_data_pipeline_spark.operators.search import bm25_topk, build_term_postings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_postings_tf_and_dl(spark):
    df = _docs(spark, [(1, "cat cat dog"), (2, "Dog bird")])
    post = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in build_term_postings(df).collect()
    }
    # lowercased analyzer: "Dog" folds into "dog"
    assert post[("cat", 1)] == (2, 3)
    assert post[("dog", 1)] == (1, 3)
    assert post[("dog", 2)] == (1, 2)
    assert post[("bird", 2)] == (1, 2)
    assert len(post) == 4


def _bm25_model(corpus, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for d, t in toks.items():
        s, hit = 0.0, 0
        for term in set(terms):
            tf = t.count(term)
            if not tf:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            hit += 1
        if hit:
            scores[d] = (hit, round(s, 6))
    return scores


def test_bm25_matches_hand_model(spark):
    corpus = [
        (1, "spark shuffle join join"),
        (2, "join scan filter"),
        (3, "shuffle shuffle shuffle scan"),
        (4, "window agg sort"),
    ]
    out = bm25_topk(_docs(spark, corpus), ["join", "shuffle"], k=10)
    got = {r["doc_id"]: (r["n_terms_matched"], r["score"]) for r in out.collect()}
    assert got == _bm25_model(corpus, ["join", "shuffle"])


def test_bm25_rank_deterministic_and_k_bounded(spark):
    corpus = [(i, "alpha beta") for i in range(1, 8)]  # 7 exact ties
    out = bm25_topk(_docs(spark, corpus), ["alpha"], k=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    assert len({r["score"] for r in out}) == 1  # identical scores, id tie-break


def test_bm25_no_match_returns_empty(spark):
    out = bm25_topk(_docs(spark, [(1, "x y")]), ["zebra"], k=5)
    assert out.count() == 0


def test_rrf_fuse_hand_model(spark):
    from dog_data_pipeline_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id LONG, rank INT")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id LONG, rank INT")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    assert out[1]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert out[3]["rrf_score"] == round(1 / 63 + 1 / 61, 6)
    assert out[2]["rrf_score"] == round(1 / 62, 6)
    assert out[9]["n_systems"] == 1 and out[1]["n_systems"] == 2
    # fused order: doc1 (.03251) > doc3 (.03227) > doc2 > doc9 (tie 1/63
    # broken by id)
    ranks = {d: r["rank"] for d, r in out.items()}
    assert ranks == {1: 1, 3: 2, 2: 3, 9: 4}


def test_rrf_fuse_k_bounds_output(spark):
    from dog_data_pipeline_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(i, i) for i in range(1, 30)], "doc_id LONG, rank INT")
    assert rrf_fuse([a], k=5).count() == 5


def test_postings_bucketed_by_term_aggregate_without_exchange(spark):
    """The index-once/query-many claim behind bm25's docstring: postings
    persisted bucketed by term make the per-term aggregations of the
    query path (document frequency, posting-list scans) shuffle-free."""
    from dog_data_pipeline_spark.sources.warehouse import write_bucketed

    docs = _docs(
        spark, [(i, f"tok{i % 7} common tok{(i + 1) % 7}") for i in range(200)]
    )
    post = build_term_postings(docs)
    write_bucketed(post, "wh_postings", "term", num_buckets=8)
    try:
        stored = spark.table("wh_postings")
        df_t = stored.groupBy("term").count()
        plan = spark._jvm.PythonSQLUtils.explainString(
            df_t._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan  # bucketing satisfies the agg
        assert df_t.count() == 8  # 7 rotating tokens + 'common'
    finally:
        spark.sql("DROP TABLE IF EXISTS wh_postings")

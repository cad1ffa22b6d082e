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

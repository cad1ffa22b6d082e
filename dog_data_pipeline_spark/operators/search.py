"""Full-text keyword search (north-star text analysis): a distributed
inverted index (term postings) plus BM25-ranked top-k retrieval.

Scale design:
- ``build_term_postings`` is one explode + partial-aggregated
  groupBy((id, term)) producing the postings table
  ``(term, id, tf, dl)``. Written bucketed-by-term (see
  ``sources/warehouse.py``) it serves term lookups with partition
  pruning and no shuffle — the classic index-once / query-many split.
- ``bm25_topk`` filters postings to the query's term set BEFORE any
  aggregation, so per-query cost is O(sum of the query terms' posting
  lists), not O(corpus). Corpus stats (N, avgdl) are one scalar
  aggregate broadcast into the scoring projection; per-term document
  frequency is a |terms|-row aggregate broadcast-joined back onto the
  postings. The final top-k is a global ``orderBy().limit(k)`` —
  Spark plans TakeOrdered, a per-partition heap + driver merge, never
  a global sort.

Scoring is Okapi BM25 (Robertson & Sparck Jones):
    idf(t)    = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    tfsat(t,d)= tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d)  = sum over query terms of idf(t) * tfsat(t, d)

Determinism contract: scores are rounded to 6 decimals BEFORE ranking
so the (rounded_score DESC, id ASC) order is identical across engines
— collapsing float-addition-order ulp noise into exact ties that the
id tie-break resolves the same way everywhere. The DuckDB oracle in
queries.py replays the identical formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def search_tokens(text) -> "F.Column":
    """Lowercased whitespace tokenization — the index's analyzer.

    Kept deliberately aligned with operators.text.tokens (SQL analog:
    ``lower(unnest(string_split_regex(trim(text), '\\s+')))``) so the
    postings table can be shared with the dedup/quality operators.
    """
    return F.split(F.lower(F.trim(text)), r"\s+")


def build_term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The inverted index: one row per (term, document) with the term
    frequency and the document length: ``(term, <id_col>, tf, dl)``.

    One explode + one partially-aggregated groupBy — map-side combine
    collapses repeated terms within a document before the shuffle, so
    shuffle volume is bounded by distinct (doc, term) pairs.
    """
    toks = docs.select(
        F.col(id_col), search_tokens(F.col(text_col)).alias("__toks")
    ).withColumn("dl", F.size("__toks"))
    return (
        toks.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", id_col, "tf", "dl")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a keyword query under BM25 ranking.

    Returns ``(<id_col>, n_terms_matched, score, rank)`` — score rounded
    to 6 decimals (the ranking key, see module docstring), rank dense
    from 1 by (score DESC, id ASC).
    """
    terms = sorted(set(t.lower() for t in terms))
    post = build_term_postings(docs, id_col, text_col).filter(
        F.col("term").isin(terms)
    )
    # corpus stats: N docs + average doc length — one scalar aggregate,
    # computed from the documents (not the filtered postings) and
    # broadcast into the scoring projection
    toks = docs.select(F.size(search_tokens(F.col(text_col))).alias("__dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    # per-term document frequency: |terms|-row aggregate, broadcast back
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))

    scored = (
        post.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__contrib",
            F.col("__idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.round(F.sum("__contrib"), 6).alias("score"),
        )
    )
    topk = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "n_terms_matched", "score", "rank"
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    threshold: float = 0.75,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs with TF-IDF cosine similarity >= ``threshold`` —
    the sparse-vector similarity join (Bayardo et al., "Scaling Up All
    Pairs Similarity Search", WWW'07 shape), complementing the set-based
    Jaccard family: TF-IDF cosine weighs repeated and rare terms, so it
    catches near-dups that token-set Jaccard underscores.

    Terms are word ``ngram``-grams (unigrams on a small vocabulary make
    every posting list hot; n-grams keep document frequency low, the
    same reason the dedup family shingles). Weights w = tf * ln(N/df);
    ``max_df`` caps posting-list length (terms in more than max_df docs
    are dropped from BOTH the weights and the norms — the standard
    maximum-document-frequency cut, sklearn's ``max_df``), bounding the
    inverted-index self-join fan-out by max_df^2 per term.

    Plan shape at scale: one explode + partial-agg groupBy(id, term)
    for tf; a |vocab|-row df aggregate joined back; per-doc norms are
    one more partial-agg groupBy(id); the candidate dot-products come
    from the inverted-index self-join (shuffle keyed on term, bounded
    by the df cap) + partial-agg groupBy(pair). No all-pairs stage.
    Cosine is rounded to 4 decimals BEFORE thresholding (both engines),
    collapsing float-summation-order ulp noise — same determinism
    contract as bm25_topk.

    Returns ``(id_a, id_b, cosine)`` with id_a < id_b.
    """
    from dog_data_pipeline_spark.operators.text import word_ngrams

    toks = docs.select(
        F.col(id_col).alias("id"), search_tokens(F.col(text_col)).alias("__toks")
    )
    tf = (
        toks.select("id", F.explode(word_ngrams(F.col("__toks"), ngram)).alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        df_t = df_t.filter(F.col("__df") <= max_df)
    w = (
        tf.join(df_t, "t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w", F.col("tf") * F.log(F.col("__n").cast("double") / F.col("__df"))
        )
        .select("id", "t", "w")
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("id").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "t", F.col("w").alias("wb"))
    dots = (
        a.join(b, "t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("__na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("__na") * F.col("__nb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) of N ranked lists —
    the standard hybrid-retrieval combiner (e.g. BM25 + embedding ANN
    for RAG): score(d) = sum over systems of 1 / (k_rrf + rank_s(d)).

    Each input needs (id_col, rank). Documents missing from a system
    simply contribute nothing — no outer join, the fusion is one
    union-all + partially-aggregated groupBy(id) + TakeOrdered(k):
    map-side combine bounds the shuffle by distinct retrieved ids, and
    nothing touches the corpus. Scores are rounded to 6 decimals before
    ranking (same engine-portability contract as bm25_topk: reordered
    float additions collapse into exact ties broken by id).

    Returns (<id_col>, rrf_score, n_systems, rank).
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank"))).alias("__c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum("__c"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_systems"),
    )
    topk = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "rrf_score", "n_systems", "rank"
    )

"""Property tests for the north-star dedup/similarity operators
(SURVEY §5.4): recall of approximate paths vs exact baselines,
idempotence/self-similarity invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.dedup import (
    embedding_near_dups,
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
    simhash_pairs,
)
from dog_data_pipeline_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from dog_data_pipeline_spark.tables import load
from tests.conftest import SF_DIR


def test_exact_dedup_finds_planted_dups(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    dup = docs.limit(5).select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    groups = exact_dup_groups(docs.unionByName(dup), "doc_id", "text")
    assert groups.count() == 5
    assert groups.filter(F.col("keep_id") >= 10**6).count() == 0  # min-id wins


def test_exact_dedup_idempotent(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    assert exact_dup_groups(docs, "doc_id", "text").count() == 0  # no dups → stable


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "a b c d")], "id INT, text STRING")
    out = shingles(df, "id", "text", n=3)
    got = {(r["id"], r["shingle"]) for r in out.collect()}
    assert got == {(2, "a b c"), (2, "b c d")}  # doc 1 too short → no shingles


def test_minhash_recall_of_true_near_dups(spark):
    docs = load(spark, SF_DIR, "documents")
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6).collect()
    }
    assert true_pairs, "test data should contain planted near-dups"
    est_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=64, bands=16, est_threshold=0.35
        ).collect()
    }
    recall = len(true_pairs & est_pairs) / len(true_pairs)
    assert recall >= 0.9, f"minhash recall {recall} on jaccard>0.6 pairs"


def test_simhash_identical_docs_distance_zero(spark):
    docs = load(spark, SF_DIR, "documents").limit(20).select("doc_id", "text")
    dup = docs.select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    pairs = simhash_pairs(
        docs.unionByName(dup), "doc_id", "text", max_hamming=0, block_bits=16
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every planted identical pair must be found at hamming 0
    expected = {(r["doc_id"], r["doc_id"] + 10**6) for r in docs.collect()}
    assert expected <= found


def test_embedding_near_dup_self_similarity(spark):
    emb = load(spark, SF_DIR, "embeddings").limit(10)
    dup = emb.select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding", "label"
    )
    pairs = embedding_near_dups(
        emb.unionByName(dup), "vec_id", "embedding", "label", threshold=0.999999
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expected = {(r["vec_id"], r["vec_id"] + 10**6) for r in emb.collect()}
    assert expected <= found  # self-join similarity == 1 >= threshold


def test_ivf_knn_recall_vs_exact(spark):
    from dog_data_pipeline_spark.operators.similarity import cosine_topk_ivf

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = cosine_topk_ivf(emb, queries, k=10, n_lists=8, n_probe=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF knn recall@10 = {recall}"
    assert approx.filter(F.col("rank") == 1).count() == 5


def test_lsh_knn_recall_vs_exact(spark):
    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = cosine_topk_lsh(emb, queries, k=10, bits_per_table=4, num_tables=12, dim=64)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"LSH knn recall@10 = {recall}"
    # top-1 must also be correct cosine ordering within the approx set
    assert approx.filter(F.col("rank") == 1).count() == 5


def test_ivfpq_knn_recall_and_exact_rerank(spark):
    from dog_data_pipeline_spark.operators.similarity import cosine_topk_ivfpq

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    approx = cosine_topk_ivfpq(
        emb, queries, k=10, n_lists=8, n_probe=3, m_sub=8, ksub=16, rerank=4
    )
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["vec_id"]) for r in a_rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"IVF-PQ knn recall@10 = {recall}"
    assert approx.filter(F.col("rank") == 1).count() == 5
    # returned cosines are EXACT (rerank recomputes from raw vectors):
    # every (q, c) pair the approx path shares with exact must agree
    ex_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    for r in a_rows:
        key = (r["query_id"], r["vec_id"])
        if key in ex_cos:
            assert abs(r["cosine"] - ex_cos[key]) < 1e-12


def test_pq_codebooks_shape_and_determinism():
    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import _train_pq_codebooks

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((300, 64))
    b1 = _train_pq_codebooks(vecs, 8, 16, seed=42)
    b2 = _train_pq_codebooks(vecs, 8, 16, seed=42)
    assert len(b1) == 8 and all(cb.shape == (16, 8) for cb in b1)
    assert all((x == y).all() for x, y in zip(b1, b2))
    import pytest

    with pytest.raises(ValueError):
        _train_pq_codebooks(vecs, 7, 16, seed=42)


def test_jaccard_cap_lower_bounds_common_and_noop_below_cap(spark):
    # corpus: two near-dup docs sharing many shingles + a boilerplate
    # shingle planted into EVERY doc (df = n_docs > cap)
    boiler = "lorem ipsum dolor"
    docs = [
        ("a", boiler + " the quick brown fox jumps over the lazy dog today"),
        ("b", boiler + " the quick brown fox jumps over the lazy dog tonight"),
    ] + [(f"f{i}", boiler + f" unrelated filler text number {i} entirely") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id STRING, text STRING")

    exact = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.3, max_shingle_df=4
        ).collect()
    }
    # n_common under the cap is a lower bound for every surviving pair
    for pair, n in capped.items():
        assert pair in exact and n <= exact[pair]
    # with a cap no shingle exceeds, the result is identical
    uncapped_equal = {
        (r["id_a"], r["id_b"]): r["n_common"]
        for r in jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.3, max_shingle_df=10**6
        ).collect()
    }
    assert uncapped_equal == exact


def test_simhash_pigeonhole_recall_is_exactly_one(spark):
    from dog_data_pipeline_spark.operators.dedup import (
        simhash64,
        simhash_pairs_pigeonhole,
    )

    # corpus with planted near-dups (small word edits) + unrelated docs
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [("d0", base)]
    words = base.split()
    for i in range(1, 9):
        edited = list(words)
        edited[i % len(words)] = f"tweak{i}"
        docs.append((f"d{i}", " ".join(edited)))
    for i in range(20):
        docs.append((f"u{i}", f"completely different corpus text item {i} about topic {i*7}"))
    df = spark.createDataFrame(docs, "doc_id STRING, text STRING")

    h = 3
    # exact ground truth: all-pairs hamming via cross join on signatures
    sig = simhash64(df, "doc_id", "text")
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= h)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_pigeonhole(df, "doc_id", "text", max_hamming=h).collect()
    }
    assert exact, "test corpus must contain at least one hamming<=h pair"
    assert got == exact  # recall 1.0 AND no false positives (exact verify step)


def test_prefix_jaccard_equals_inverted_index_jaccard(spark):
    from dog_data_pipeline_spark.operators.dedup import jaccard_pairs_prefix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r["id_a"], r["id_b"]): (r["n_common"], round(r["jaccard"], 6))
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): (r["n_common"], round(r["jaccard"], 6))
        for r in jaccard_pairs_prefix(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert base, "corpus must contain near-dup pairs"
    assert pref == base  # exact: prefix filtering loses no pair


def _physical_plan(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_jaccard_auto_picks_inverted_index_on_unskewed_corpus(spark):
    # the synthetic corpus has max shingle-DF ~25 over mean ~1 — under
    # the hot-df factor, so the plain inverted-index regime must run:
    # its plan has NO per-doc rank Window (the prefix regime's marker)
    from dog_data_pipeline_spark.operators.dedup import jaccard_pairs_auto

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = jaccard_pairs_auto(docs, "doc_id", "text", n=3, threshold=0.5)
    assert "Window" not in _physical_plan(out)
    base = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == base


def test_jaccard_auto_picks_prefix_regime_on_hot_shingles(spark):
    # plant a boilerplate shingle in EVERY doc: max df == n_docs while
    # the mean stays ~1 -> skew over the factor -> prefix regime, whose
    # plan ranks shingles per doc (Window node present)
    from dog_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_auto,
        jaccard_pairs_prefix,
    )

    boiler = "standard legal disclaimer applies"
    rows = [(i, f"{boiler} unique{i} body{i} words{i} here{i}") for i in range(200)]
    rows += [(1000, f"{boiler} copy of this exact document text"),
             (1001, f"{boiler} copy of this exact document text")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = jaccard_pairs_auto(docs, "doc_id", "text", n=3, threshold=0.5,
                             hot_df_factor=20.0)
    assert "Window" in _physical_plan(out)
    expected = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == expected
    assert (1000, 1001) in expected


def test_semantic_dedup_finds_planted_copies_keeps_one(spark):
    from dog_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = load(spark, SF_DIR, "embeddings").limit(50)
    # plant exact copies (cosine 1.0) of 3 vectors under shifted ids
    copies = emb.limit(3).select((F.col("vec_id") + 10**6).alias("vec_id"), "embedding", "label")
    out = semantic_dedup(
        emb.unionByName(copies), "vec_id", "embedding", n_clusters=4, threshold=0.99
    )
    rows = out.collect()
    # each planted copy pairs with its original: 3 groups of exactly 2
    groups = {}
    for r in rows:
        groups.setdefault(r["dup_group"], []).append(r)
    assert len(groups) == 3
    for members in groups.values():
        assert len(members) == 2
        assert sum(m["keep"] for m in members) == 1  # exactly one survivor
        # copy and original sit in the same k-means cell
        assert len({m["cell"] for m in members}) == 1


def test_semantic_dedup_no_dups_empty(spark):
    from dog_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = load(spark, SF_DIR, "embeddings").limit(30)
    # corpus max pairwise cosine is ~0.51 — at 0.99 nothing matches
    assert semantic_dedup(emb, "vec_id", "embedding", n_clusters=4, threshold=0.99).count() == 0


def test_semantic_dedup_keep_rule_is_least_prototypical(spark):
    from dog_data_pipeline_spark.operators.similarity import semantic_dedup

    emb = load(spark, SF_DIR, "embeddings").limit(40)
    copies = emb.limit(5).select((F.col("vec_id") + 10**6).alias("vec_id"), "embedding", "label")
    out = semantic_dedup(
        emb.unionByName(copies), "vec_id", "embedding", n_clusters=2, threshold=0.99
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["dup_group"], []).append(r)
    for members in by_group.values():
        kept = [m for m in members if m["keep"]][0]
        min_sim = min(m["centroid_sim"] for m in members)
        assert abs(kept["centroid_sim"] - min_sim) < 1e-12


def test_prototype_prune_flags_cluster_cores(spark):
    from dog_data_pipeline_spark.operators.similarity import prototype_prune

    emb = load(spark, SF_DIR, "embeddings")
    out = prototype_prune(emb, "vec_id", "embedding", n_clusters=4, prune_fraction=0.25)
    rows = out.collect()
    assert len(rows) == emb.count()  # every vector gets a verdict
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        pruned = [m for m in members if m["prune"]]
        frac = len(pruned) / len(members)
        assert frac <= 0.35, (cell, frac)  # ~25% plus rank granularity
        # pruned members are the TOP of the centroid_sim ranking
        if pruned:
            min_pruned = min(m["centroid_sim"] for m in pruned)
            kept_above = [
                m for m in members
                if not m["prune"] and m["centroid_sim"] > min_pruned + 1e-12
            ]
            assert not kept_above


def test_prototype_prune_deterministic(spark):
    from dog_data_pipeline_spark.operators.similarity import prototype_prune

    emb = load(spark, SF_DIR, "embeddings")
    a = {r["vec_id"]: r["prune"] for r in prototype_prune(emb).collect()}
    b = {r["vec_id"]: r["prune"] for r in prototype_prune(emb.repartition(7)).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# edit_distance_pairs (PassJoin partition blocking)
# ---------------------------------------------------------------------------


def _brute_pairs(rows, k, prefix_len=80):
    """All-pairs reference: plain DP Levenshtein on prefixes."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = [(i, t[:prefix_len]) for i, t in rows]
    out = set()
    for x in range(len(rows)):
        for y in range(x + 1, len(rows)):
            ia, sa = rows[x]
            ib, sb = rows[y]
            d = lev(sa, sb)
            if d <= k:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, d))
    return out


def _run_pairs(spark, rows, k, prefix_len=80):
    from dog_data_pipeline_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(rows, ["id", "text"])
    got = edit_distance_pairs(
        df, "id", "text", prefix_len=prefix_len, max_edits=k
    ).collect()
    return {(r.id_a, r.id_b, r.edit_distance) for r in got}


def test_edit_distance_planted_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),          # 1 substitution
        (3, base + " xx"),                            # within prefix? beyond len
        (4, "completely different words entirely here that share nothing at all"),
        (5, base.replace("brown fox", "green cat")),  # several edits
    ]
    got = _run_pairs(spark, rows, k=8)
    assert got == _brute_pairs(rows, k=8)
    assert (1, 2, 1) in got
    assert not any({a, b} == {1, 4} for a, b, _ in got)


def test_edit_distance_short_string_recall(spark):
    # The recall hole of the old q-gram bound: two disjoint short strings
    # within k edits share NO gram yet are a true pair. The short-path
    # broadcast block must find them.
    rows = [(1, "aaaaaaaa"), (2, "bbbbbbbb"), (3, "aaaaaaab"), (4, "zzzz")]
    got = _run_pairs(spark, rows, k=8)
    assert got == _brute_pairs(rows, k=8)
    assert (1, 2, 8) in got  # ed = 8 exactly, zero shared grams


def test_edit_distance_boundary_lengths_match_bruteforce(spark):
    # Lengths straddling the short/main path boundary (short_max = 2(k+1))
    # exercise the cross-path pairing and the multi-match-aware windows
    # with every delta in [0, k].
    import random

    rnd = random.Random(42)
    alphabet = "ab"
    rows = [
        (i, "".join(rnd.choice(alphabet) for _ in range(rnd.randint(4, 40))))
        for i in range(60)
    ]
    for k in (2, 4):
        assert _run_pairs(spark, rows, k=k) == _brute_pairs(rows, k=k), k


def test_edit_distance_property_random_corpus(spark):
    # Property check on a templated low-alphabet corpus (the regime that
    # sank the q-gram plan): near-dups planted by mutating a base string.
    import random

    rnd = random.Random(7)
    words = ["spark", "join", "sort", "scan", "agg", "key"]
    docs = []
    for i in range(80):
        base = " ".join(rnd.choice(words) for _ in range(25))
        docs.append((i, base))
        if i % 4 == 0:  # plant a near-dup with a few char edits
            chars = list(base)
            for _ in range(rnd.randint(1, 6)):
                chars[rnd.randrange(len(chars))] = rnd.choice("xyz")
            docs.append((1000 + i, "".join(chars)))
    assert _run_pairs(spark, docs, k=8) == _brute_pairs(docs, k=8)


def test_edit_distance_prefix_truncation(spark):
    # Strings that differ only BEYOND prefix_len are distance 0 on prefixes.
    a = "x" * 100
    b = "x" * 80 + "y" * 20
    got = _run_pairs(spark, [(1, a), (2, b)], k=3, prefix_len=80)
    assert got == {(1, 2, 0)}


def test_duplicate_spans_rolling_equals_md5(spark):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    docs = load(spark, SF_DIR, "documents")
    a = {
        (r.id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, "doc_id").collect()
    }
    b = {
        (r.id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, "doc_id", fingerprint="rolling").collect()
    }
    assert a == b and len(a) > 0


def test_duplicate_spans_rejects_unknown_engine(spark):
    import pytest

    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    docs = load(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unknown fingerprint engine"):
        duplicate_spans(docs, "doc_id", fingerprint="sha9000")


def test_edit_distance_survives_duplicate_heavy_corpus(spark):
    """Whole-corpus duplication is the adversarial regime for every
    candidate scheme (all blocking keys collide). Each identical pair IS
    a true pair (ed=0), so output is inherently O(copies^2 * docs) — the
    operator must produce exactly that set without the candidate join
    degenerating beyond it."""
    from dog_data_pipeline_spark.operators.dedup import edit_distance_pairs

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    copies = 4
    corpus = docs
    for c in range(1, copies):
        corpus = corpus.unionByName(
            docs.select((F.col("doc_id") + 1_000_000 * c).alias("doc_id"), "text")
        )
    out = edit_distance_pairs(corpus, "doc_id", "text", prefix_len=80, max_edits=2)
    pairs = out.collect()
    n_docs = docs.count()
    # baseline pairs among originals at k=2
    base = edit_distance_pairs(docs, "doc_id", "text", prefix_len=80, max_edits=2)
    n_base = base.count()
    # every original doc contributes C(copies,2) identical pairs, and each
    # base pair replicates copies^2 times across copy combinations
    expect = n_docs * copies * (copies - 1) // 2 + n_base * copies * copies
    assert len(pairs) == expect, (len(pairs), expect, n_base)
    assert all(p.edit_distance <= 2 for p in pairs)


# ---------------------------------------------------------------------------
# embedding-space audit
# ---------------------------------------------------------------------------


def test_embedding_space_report_tight_and_loose_clusters(spark):
    from dog_data_pipeline_spark.operators.similarity import (
        embedding_space_report,
    )

    rows = [
        # label 0: identical vectors -> cohesion exactly 1.0
        (0, 0, [1.0, 0.0]), (1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),
        # label 1: orthogonal pair -> centroid at 45deg, cos ~0.7071
        (3, 1, [2.0, 0.0]), (4, 1, [0.0, 2.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>"
    )
    out = {r["label"]: r for r in embedding_space_report(df).collect()}
    assert out[0]["n_vectors"] == 3
    assert out[0]["mean_centroid_cos"] == 1.0
    assert out[0]["min_centroid_cos"] == 1.0
    assert out[1]["n_vectors"] == 2
    assert out[1]["mean_centroid_cos"] == 0.7071
    assert out[1]["min_centroid_cos"] == out[1]["max_centroid_cos"] == 0.7071


def test_embedding_space_report_zero_vector_yields_null_cos_not_crash(spark):
    from dog_data_pipeline_spark.operators.similarity import (
        embedding_space_report,
    )

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.0, 0.0]),   # zero-norm member
        (2, 1, [1.0, 0.0]),
        (3, 1, [-1.0, 0.0]),  # label 1 centroid cancels to zero vector
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>"
    )
    out = {r["label"]: r for r in embedding_space_report(df).collect()}
    # label 0: the real vector still scores vs centroid; the zero
    # vector contributes a null (skipped by avg/min/max)
    assert out[0]["n_vectors"] == 2
    assert out[0]["mean_centroid_cos"] == 1.0
    # label 1: degenerate centroid -> every cosine null, stats null
    assert out[1]["n_vectors"] == 2
    assert out[1]["mean_centroid_cos"] is None


def test_ngram_novelty_first_owner_semantics(spark):
    """Planted construction: doc 1 is all-novel; doc 2 repeats doc 1
    verbatim (novelty 0); doc 3 shares a suffix with doc 1."""
    from dog_data_pipeline_spark.operators.dedup import ngram_novelty

    rows = [
        (1, "a b c d e"),          # trigrams: abc bcd cde — all first-owned
        (2, "a b c d e"),          # identical — zero novel
        (3, "x y c d e"),          # xyc yc? -> trigrams: "x y c" "y c d" "c d e"
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id").collect()}
    assert got[1]["n_novel"] == got[1]["n_distinct_ngrams"] == 3
    assert got[1]["novelty_frac"] == 1.0
    assert got[2]["n_novel"] == 0 and got[2]["novelty_frac"] == 0.0
    # doc 3: "c d e" first-owned by doc 1; "x y c"/"y c d" novel
    assert got[3]["n_distinct_ngrams"] == 3 and got[3]["n_novel"] == 2


def test_ngram_novelty_short_doc_absent_and_append_stable(spark):
    """Docs with <n tokens yield no row; appending new docs never
    changes existing docs' scores (min-id first owner)."""
    from dog_data_pipeline_spark.operators.dedup import ngram_novelty

    base = spark.createDataFrame(
        [(1, "a b c d"), (2, "too short")], "doc_id INT, text STRING"
    )
    r1 = {r["doc_id"]: r for r in ngram_novelty(base, "doc_id").collect()}
    assert 2 not in r1  # one token pair < trigram width
    appended = base.union(
        spark.createDataFrame([(9, "a b c d")], "doc_id INT, text STRING")
    )
    r2 = {r["doc_id"]: r for r in ngram_novelty(appended, "doc_id").collect()}
    assert r2[1] == r1[1]          # old score unchanged
    assert r2[9]["n_novel"] == 0   # repeat owns nothing


def test_contrastive_pairs_hand_fixture(spark):
    """2-D fixture with hand-checkable cosines: positive is the nearest
    same-label vector, negatives rank by cosine desc, margin gap and
    the semi-hard violation flag follow the unrounded gap, and an
    anchor whose label is unique in the corpus yields no triplet."""
    from dog_data_pipeline_spark.operators.similarity import contrastive_pairs

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.1], 0),   # cos vs anchor = 0.995037 -> the positive
        (2, [0.9, 0.5], 1),   # cos = 0.874157 -> hard negative
        (3, [0.0, 1.0], 1),   # cos = 0.0      -> easy negative
        (4, [0.0, 1.0], 0),   # same label but farther than id 1
        (5, [1.0, 0.0], 9),   # label unique in corpus
    ]
    df = spark.createDataFrame(
        rows, "vec_id INT, embedding ARRAY<DOUBLE>, label INT"
    )
    out = contrastive_pairs(
        df, df.filter("vec_id IN (0, 5)"), k_neg=5, margin=0.2
    ).collect()
    assert {r["anchor_id"] for r in out} == {0}  # id 5 has no positive
    by_rank = {r["neg_rank"]: r for r in out}
    assert len(by_rank) == 3
    assert all(r["pos_id"] == 1 for r in out)
    assert abs(by_rank[1]["pos_cos"] - 0.995037) < 1e-5
    # negatives for anchor 0: id 5 (label 9, cos 1.0), id 2, id 3
    assert by_rank[1]["neg_id"] == 5 and by_rank[1]["neg_cos"] == 1.0
    assert by_rank[2]["neg_id"] == 2 and by_rank[3]["neg_id"] == 3
    assert abs(by_rank[2]["neg_cos"] - 0.874157) < 1e-5
    assert abs(by_rank[2]["margin_gap"] - 0.120880) < 1e-5
    assert by_rank[1]["is_violation"] is True    # gap -0.004963 < 0.2
    assert by_rank[2]["is_violation"] is True    # 0.1209 < 0.2
    assert by_rank[3]["is_violation"] is False   # 0.9950 >= 0.2


def test_ivf_persisted_index_matches_in_memory_and_prunes(spark, tmp_path):
    """build_ivf_index + query_ivf_index: (a) results are bit-identical
    to the in-memory cosine_topk_ivf on the same corpus — the
    same-quantizer identity: the default balance pass no-ops here
    (sampled masses under the bound), so both paths train the same
    plain-Lloyd's quantizer and share fold + tie-breaks; (b) the query
    scan is PARTITION-PRUNED —
    only the probed cell directories contribute input files; (c) the
    sidecar records the trained quantizer."""
    import json
    import os
    import re

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, root, n_lists=8, seed=42)
    assert len(meta["centroids"]) == 8
    assert json.load(open(os.path.join(root, "ivf_meta.json")))["n_lists"] == 8

    got = query_ivf_index(spark, root, queries, k=10, n_probe=3)
    want = cosine_topk_ivf(emb, queries, k=10, n_lists=8, n_probe=3)
    g = {(r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
         for r in got.collect()}
    w = {(r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
         for r in want.collect()}
    assert g == w

    # pruning: the probed-cell predicate must land in the scan's
    # PartitionFilters (pruned at planning, before any file is opened) —
    # NOT in a post-scan data filter. (inputFiles() can't show this: it
    # lists the relation's files ignoring filters.)
    one = query_ivf_index(
        spark, root, emb.filter(F.col("vec_id") == 0), k=5, n_probe=2
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), f"no partition filter on cell:\n{m}"
    # Count probed-cell VALUES, not every digit in the rendered filter
    # (expression ids like `cell#12` carry digits too): a multi-cell
    # probe renders as `cell IN (a,b,...)`, a single cell as an equality
    # literal — parse whichever shape this Spark version emitted.
    in_list = re.search(r"\bIN\s*\(([^)]*)\)", m.group(1))
    if in_list:
        probed_n = len([v for v in in_list.group(1).split(",") if v.strip()])
    else:
        eqs = re.findall(r"=\s*(\d+)", m.group(1))
        assert eqs, f"filter is neither IN-list nor equality: {m.group(1)}"
        probed_n = len(set(eqs))
    assert probed_n <= 2, m.group(1)


def test_ivf_append_incremental_matches_bulk_and_guards_drift(spark, tmp_path):
    """ivf_append: (a) appending a batch against the sidecar centroids
    yields the SAME top-k as a bulk rebuild of corpus+batch under the
    same centroids (incremental maintenance ≡ batch recompute); (b) the
    sidecar's cumulative cell counts track corpus+batch without ever
    re-scanning the index; (c) the drift guard recommends a rebuild
    when a skewed batch fattens one cell past the bound, and stays
    quiet below it."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    inc_root = str(tmp_path / "inc")
    meta = build_ivf_index(corpus, inc_root, n_lists=8, seed=42)
    n_corpus = corpus.count()
    assert sum(meta["cell_counts"].values()) == n_corpus

    stats = ivf_append(batch, inc_root)
    n_batch = batch.count()
    assert stats["appended"] == n_batch
    assert sum(stats["cell_counts"].values()) == n_corpus + n_batch
    # sidecar on disk agrees with the returned stats
    side = json.load(open(os.path.join(inc_root, "ivf_meta.json")))
    assert side["cell_counts"] == stats["cell_counts"]
    assert side["centroids"] == meta["centroids"]  # never retrained

    bulk_root = str(tmp_path / "bulk")
    build_ivf_index(emb, bulk_root, n_lists=8, centroids=meta["centroids"])
    got = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in query_ivf_index(spark, inc_root, queries, k=10, n_probe=3).collect()
    }
    want = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in query_ivf_index(spark, bulk_root, queries, k=10, n_probe=3).collect()
    }
    assert got == want

    # drift guard: a batch aimed at ONE centroid (its exact vector,
    # replicated) fattens that cell past the skew bound
    assert not stats["rebuild_recommended"]
    hot = meta["centroids"][0]
    n_hot = 3 * (n_corpus + n_batch) // len(meta["centroids"])
    hot_batch = spark.range(n_hot).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in hot]).alias("embedding"),
    )
    stats2 = ivf_append(hot_batch, inc_root, skew_bound=2.0)
    assert stats2["rebuild_recommended"]
    assert stats2["max_mean_skew"] > 2.0


def test_ivf_verify_detects_and_repairs_stale_sidecar(spark, tmp_path):
    """ivf_verify: consistent after build+append; a simulated crash
    window (parquet appended, sidecar write lost) is detected as a
    count diff and repair=True restores the sidecar from the index."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_verify,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    meta_path = os.path.join(root, "ivf_meta.json")
    pre_append = json.load(open(meta_path))
    ivf_append(emb.filter(F.col("vec_id") % 5 == 0), root)
    assert ivf_verify(spark, root)["consistent"]

    # simulate the crash window: roll the sidecar back to pre-append
    with open(meta_path, "w") as fh:
        json.dump(pre_append, fh)
    audit = ivf_verify(spark, root)
    assert not audit["consistent"]
    assert sum(a - s for s, a in audit["diff"].values()) == emb.filter(
        F.col("vec_id") % 5 == 0
    ).count()

    fixed = ivf_verify(spark, root, repair=True)
    assert fixed["repaired"] and not fixed["consistent"]  # reports pre-repair state
    assert fixed["consistent_after"]  # ...but the post-call state is healthy
    clean = ivf_verify(spark, root)
    assert clean["consistent"] and clean["consistent_after"]
    assert clean["lock_held"] is None
    assert json.load(open(meta_path))["centroids"] == pre_append["centroids"]


def test_ivf_append_lock_excludes_concurrent_appenders(spark, tmp_path):
    """ivf_append's single-writer contract (r7 verdict ask #3): (a) a
    held lock makes a second appender time out rather than silently
    lose its sidecar update; (b) ivf_verify reports the held lock; (c)
    a lock left by a CRASHED appender (dead pid) is broken
    automatically; (d) the lost-update outcome the lock prevents — a
    concurrent appender's counts overwritten, exactly what an unlocked
    read-modify-write produced — is detected by ivf_verify and repaired
    with consistent_after=True. Two genuinely interleaved appends are
    simulated by replaying the unlocked schedule: both parquet writes
    land, the first sidecar update is clobbered by the second writer's
    stale read."""
    import json
    import os

    import pytest

    from dog_data_pipeline_spark.operators.similarity import (
        IvfAppendLockTimeout,
        build_ivf_index,
        ivf_append,
        ivf_verify,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    lock = os.path.join(root, "ivf_meta.lock")
    meta_path = os.path.join(root, "ivf_meta.json")
    batch_a = emb.filter(F.col("vec_id") % 5 == 0)
    batch_b = emb.filter(F.col("vec_id") % 7 == 3)

    # (a)+(b): a live writer's lock excludes a second appender
    with open(lock, "w") as fh:
        json.dump({"pid": os.getpid(), "acquired_unix": 0.0}, fh)
    with pytest.raises(IvfAppendLockTimeout):
        ivf_append(batch_a, root, lock_timeout_s=0.6)
    assert ivf_verify(spark, root)["lock_held"] == os.getpid()

    # (c): a crashed appender's lock (dead pid) is broken, append wins
    pre_a = json.load(open(meta_path))  # corpus-only counts
    with open(lock, "w") as fh:
        json.dump({"pid": 2_000_000_000, "acquired_unix": 0.0}, fh)
    stats = ivf_append(batch_a, root, lock_timeout_s=5.0)
    assert stats["appended"] == batch_a.count()
    assert not os.path.exists(lock)  # released after the append

    # (d): replay the unlocked interleaving — writer B read the sidecar
    # before writer A's update landed, then overwrote it (last-writer-
    # wins). The parquet rows of BOTH appends survive; only A's counts
    # are lost from the sidecar.
    pre_b = json.load(open(meta_path))  # corpus + A counts
    ivf_append(batch_b, root)
    post_b = json.load(open(meta_path))  # corpus + A + B (the truth)
    stale = dict(post_b)
    # B's stale read saw pre_a; its write = pre_a + B's batch counts =
    # truth minus A's batch counts (A = pre_b - pre_a, per cell).
    a_counts = {
        k: v - pre_a["cell_counts"].get(k, 0)
        for k, v in pre_b["cell_counts"].items()
    }
    stale["cell_counts"] = {
        k: v - a_counts.get(k, 0) for k, v in post_b["cell_counts"].items()
    }
    stale["cell_counts"] = {
        k: v for k, v in stale["cell_counts"].items() if v > 0
    }
    with open(meta_path, "w") as fh:
        json.dump(stale, fh)
    audit = ivf_verify(spark, root, repair=True)
    assert not audit["consistent"] and audit["repaired"]
    assert audit["consistent_after"]
    assert json.load(open(meta_path))["cell_counts"] == post_b["cell_counts"]


def test_ivf_drift_rebuild_restores_pruning_and_exactness(spark, tmp_path):
    """The drift guard's REBUILD path end-to-end (r7 verdict ask #2):
    append a hot out-of-distribution blob against frozen centroids until
    ``rebuild_recommended`` flips, rebuild fresh (retrain on the current
    corpus, read back from the index itself), then pin both halves of
    the rebuild contract: (a) CORRECTNESS — full-probe queries
    (n_probe = n_lists) against the drifted and the rebuilt index are
    identical, because full probe is exact cosine top-k over the same
    rows and a rebuild changes LAYOUT, never RESULTS; (b) PRUNING
    RECOVERY — the retrained quantizer splits the blob across cells, so
    max/mean skew falls back under the trigger bound and the corpus
    fraction a fixed-n_probe query must scan at the hot spot drops."""
    import os

    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_verify,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "drifted")
    meta = build_ivf_index(emb, root, n_lists=8, seed=42)
    hot = np.asarray(meta["centroids"][0], dtype=np.float64)
    dim = len(hot)
    n0 = sum(meta["cell_counts"].values())

    # hot blob: centroid-0 neighborhood with deterministic per-row,
    # per-dim jitter (a new region growing in the data distribution —
    # NOT identical replicas, which no quantizer could ever split).
    # Amplitude 0.15 sizes the blob against the corpus scale (unit-norm
    # vectors, ~1.4 median pairwise distance): tight enough that the
    # FROZEN quantizer funnels it into centroid 0's cell (that is the
    # drift), broad+heavy enough (4 x corpus-size batches) that a
    # RETRAIN provably prefers splitting it across cells.
    stats = None
    for b in range(4):
        batch = spark.range(n0).select(
            (F.col("id") + 1_000_000 + b * 10_000_000).alias("vec_id"),
            F.array(
                *[
                    F.lit(float(hot[j]))
                    + 0.15 * F.sin((F.col("id") + 1) * float(j + 1) + float(b))
                    for j in range(dim)
                ]
            ).alias("embedding"),
        )
        stats = ivf_append(batch, root, skew_bound=3.0)
    assert stats["rebuild_recommended"] and stats["max_mean_skew"] > 3.0
    drifted_counts = {int(k): v for k, v in stats["cell_counts"].items()}

    # rebuild = retrain on the CURRENT corpus (the index is the corpus
    # of record), written to a fresh path — stage-then-swap, the
    # immutability contract from build_ivf_index's docstring
    current = spark.read.parquet(os.path.join(root, "index")).select(
        "vec_id", "embedding"
    )
    root2 = str(tmp_path / "rebuilt")
    meta2 = build_ivf_index(current, root2, n_lists=8, seed=42)
    rebuilt_counts = {int(k): v for k, v in meta2["cell_counts"].items()}
    assert sum(rebuilt_counts.values()) == sum(drifted_counts.values())
    assert ivf_verify(spark, root2)["consistent_after"]

    # (a) rebuild changes layout, not results: full probe is exact
    queries = emb.filter(F.col("vec_id") < 5)

    def full_probe(path):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in query_ivf_index(
                spark, path, queries, k=10, n_probe=8
            ).collect()
        }

    assert full_probe(root) == full_probe(root2)

    # (b) pruning recovery: skew back under the trigger bound...
    def skew(counts):
        return max(counts.values()) / (sum(counts.values()) / 8)

    assert skew(rebuilt_counts) < skew(drifted_counts)
    assert skew(rebuilt_counts) <= 2.0
    # ...and a fixed-n_probe query AT the hot spot scans a smaller
    # corpus fraction (driver-side mirror of _nearest_cells: euclidean
    # argsort over the sidecar centroids, then sum probed cell counts)
    def scanned_fraction(centroids, counts, n_probe=2):
        mat = np.asarray(centroids, dtype=np.float64)
        probed = np.argsort(
            ((mat - hot[None, :]) ** 2).sum(axis=1), kind="stable"
        )[:n_probe]
        return sum(counts.get(int(c), 0) for c in probed) / sum(counts.values())

    f_drifted = scanned_fraction(meta["centroids"], drifted_counts)
    f_rebuilt = scanned_fraction(meta2["centroids"], rebuilt_counts)
    assert f_rebuilt < f_drifted



def test_split_heavy_cells_unit_contract():
    """Unit contract of the mass-aware quantizer post-pass: splits a
    heavy tight cluster plain k-means leaves alone, respects the
    centroid budget, and refuses to chase identical replicas (which no
    quantizer can separate) instead of looping to the cap."""
    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        _lloyd,
        _split_heavy_cells,
    )

    rng = np.random.default_rng(7)
    spread = rng.standard_normal((900, 8)) * 3.0
    blob = np.full((600, 8), 25.0) + 0.01 * np.sin(
        np.outer(np.arange(1, 601), np.arange(1, 9))
    )
    vecs = np.vstack([spread, blob])
    # start from the shape the 2M soak measured: blob in ONE cell
    # (constructed directly — the collapse itself is pinned by the
    # integration test below; this pins the post-pass contract)
    cents = np.vstack(
        [_lloyd(spread, 3, seed=42), blob.mean(axis=0, keepdims=True)]
    )

    def counts(c):
        d = (
            (vecs**2).sum(1)[:, None]
            - 2.0 * (vecs @ c.T)
            + (c**2).sum(1)[None, :]
        )
        return np.bincount(d.argmin(1), minlength=len(c))

    assert counts(cents).max() >= 600  # the blob sits in one cell
    bal = _split_heavy_cells(vecs, cents, bound=1.5, max_lists=16, seed=42)
    got = counts(bal)
    assert len(bal) > len(cents)
    assert got.max() <= 1.5 * (len(vecs) / len(bal))
    # budget respected
    tight = _split_heavy_cells(vecs, cents, bound=1.01, max_lists=6, seed=42)
    assert len(tight) <= 6
    # identical replicas: unsplittable — returns instead of spinning
    reps = np.vstack([spread, np.full((600, 8), 25.0)])
    cents_r = np.vstack(
        [_lloyd(spread, 3, seed=42), reps[900:901]]
    )
    same = _split_heavy_cells(reps, cents_r, 1.2, 64, 42)
    d = (
        (reps**2).sum(1)[:, None]
        - 2.0 * (reps @ same.T)
        + (same**2).sum(1)[None, :]
    )
    n = np.bincount(d.argmin(1), minlength=len(same))
    assert n.max() >= 600  # replicas stay together, by design


def test_balanced_build_splits_variance_starved_hot_cell(spark, tmp_path):
    """The failure mode the 2M drift soak measured (r8, BENCH_LOCAL_r08
    `ivf_drift_rebuild_2m_r8`): a drift blob that is DENSE but a modest
    corpus fraction collapses to ONE cell under plain Lloyd's even when
    mass-proportional init lands many centroids inside it — the mean
    step contracts them to near-identical points, winner-take-all
    assignment empties all but one, and reseeding moves the rest away.
    A plain retrain therefore reproduces the very skew the drift guard
    fired on. `balance_bound` fixes it mass-aware. Miniature of the
    soak shape: 50 gaussian clusters (12k rows, spread 3.0, unit
    noise) + a 2k blob jittered 0.15 around cluster-center 0."""
    import os

    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_verify,
        query_ivf_index,
    )

    dim = 64
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((50, dim)) * 3.0
    which = rng.integers(0, 50, 12_000)
    corpus_np = centers[which] + rng.standard_normal((12_000, dim))
    ids = np.arange(2_000)
    blob_np = centers[0][None, :] + 0.15 * np.sin(
        np.outer(ids + 1, np.arange(1, dim + 1))
    )
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(corpus_np)]
    rows += [
        (int(i) + 10**6, [float(x) for x in v]) for i, v in enumerate(blob_np)
    ]
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    def skew(meta):
        counts = [int(v) for v in meta["cell_counts"].values()]
        return max(counts) / (sum(counts) / len(meta["centroids"]))

    def blob_cells(root):
        return (
            spark.read.parquet(os.path.join(root, "index"))
            .filter(F.col("vec_id") >= 10**6)
            .select("cell")
            .distinct()
            .count()
        )

    plain_root = str(tmp_path / "plain")
    # balance_bound=None: the PLAIN quantizer (since r9 builds balance
    # by default, this test pins the failure mode the default prevents)
    plain = build_ivf_index(
        corpus, plain_root, n_lists=16, seed=42, balance_bound=None
    )
    assert blob_cells(plain_root) == 1  # the collapse, pinned
    assert skew(plain) > 2.0
    assert plain["effective_lists"] == 16 and plain["balance_bound"] is None

    bal_root = str(tmp_path / "balanced")
    bal = build_ivf_index(corpus, bal_root, n_lists=16, seed=42, balance_bound=2.0)
    assert len(bal["centroids"]) > 16  # the split grew the centroid list
    assert bal["effective_lists"] == len(bal["centroids"])
    assert bal["balance_bound"] == 2.0
    assert blob_cells(bal_root) >= 2  # blob actually split on disk
    # split decided on the training sample; allow true-count slack, and
    # pin that the recovery is real vs the plain build
    assert skew(bal) <= 2.5
    assert skew(bal) < skew(plain) - 0.4
    assert ivf_verify(spark, bal_root)["consistent_after"]

    # balancing changes LAYOUT, never RESULTS: full probe is exact on both
    queries = corpus.filter(F.col("vec_id") < 3)

    def full_probe(root, n_probe):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 9))
            for r in query_ivf_index(
                spark, root, queries, k=5, n_probe=n_probe
            ).collect()
        }

    assert full_probe(plain_root, 16) == full_probe(bal_root, len(bal["centroids"]))
    # and the on-disk layout is partitioned by the GROWN cell list
    cells = {
        d
        for d in os.listdir(os.path.join(bal_root, "index"))
        if d.startswith("cell=")
    }
    assert len(cells) == len(bal["centroids"])


def test_ivf_write_clustering_bounds_file_count(spark, tmp_path):
    """The write-clustering contract (r8): build shuffles by
    (cell, salt) before its partitionBy write, so the index holds
    ~cells x salt_mod files instead of tasks x cells (measured 81,920
    ~320KB files for an unclustered 32M x 512-list build); an append
    adds at most one file per touched cell."""
    import glob
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
    )

    emb = load(spark, SF_DIR, "embeddings").repartition(8)  # >1 task per cell
    root = str(tmp_path / "idx")
    meta = build_ivf_index(emb, root, n_lists=8, seed=42)

    def files_per_cell():
        return {
            cell: len(glob.glob(os.path.join(root, "index", cell, "*.parquet")))
            for cell in os.listdir(os.path.join(root, "index"))
            if cell.startswith("cell=")
        }

    built = files_per_cell()
    assert built and all(n == 1 for n in built.values()), built

    batch = emb.select((F.col("vec_id") + 10**6).alias("vec_id"), "embedding")
    ivf_append(batch.repartition(8), root)
    after = files_per_cell()
    assert all(n <= 2 for n in after.values()), after
    # nothing lost to the clustering: counts cover corpus + batch
    assert sum(int(v) for v in
               __import__("json").load(
                   open(os.path.join(root, "ivf_meta.json"))
               )["cell_counts"].values()) == emb.count() + batch.count()


def _vec_df(spark, vecs, id_offset=0):
    rows = [
        (int(id_offset + i), [float(x) for x in v]) for i, v in enumerate(vecs)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_ivf_default_balance_keeps_fresh_skewed_build_under_guard(spark, tmp_path):
    """r8 finding (BENCH_LOCAL_r08 ivf_scaling_law_clustered_r8): NATURAL
    skew trips the drift guard on a FRESH build — a dense region holds a
    large corpus fraction in one variance-starved cell, so the user's
    first build + append immediately reported rebuild_recommended on a
    healthy index. Since r9 build_ivf_index mass-balances by DEFAULT
    (balance_bound=4.0 == ivf_append's skew_bound): (a) the plain
    quantizer (balance_bound=None) reproduces the wart, (b) the default
    build splits the hot region and a fresh build + append stays under
    the guard, (c) a caller-supplied quantizer records
    balance_bound=None in the sidecar — the meta never claims a balance
    that was not applied (advisor r8)."""
    import json
    import os

    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
    )

    rng = np.random.RandomState(7)
    n, frac = 2000, 0.7
    blob = rng.normal(0, 0.02, size=(int(n * frac), 8)) + 5.0
    spread = rng.uniform(-10, 10, size=(n - int(n * frac), 8))
    vecs = np.vstack([blob, spread])
    rng.shuffle(vecs)
    df = _vec_df(spark, vecs)
    batch = _vec_df(spark, rng.uniform(-10, 10, size=(200, 8)), id_offset=n)

    plain = build_ivf_index(
        df, str(tmp_path / "plain"), n_lists=8, seed=42, balance_bound=None
    )
    counts = [int(v) for v in plain["cell_counts"].values()]
    plain_skew = max(counts) / (sum(counts) / len(plain["centroids"]))
    assert plain_skew > 4.0, plain_skew  # variance-blind Lloyd's: hot cell
    assert plain["balance_bound"] is None
    stats_plain = ivf_append(batch, str(tmp_path / "plain"))
    assert stats_plain["rebuild_recommended"]  # the r8 UX wart, reproduced

    bal = build_ivf_index(df, str(tmp_path / "bal"), n_lists=8, seed=42)
    assert bal["balance_bound"] == 4.0
    assert len(bal["centroids"]) > 8  # the hot region was split
    stats = ivf_append(batch, str(tmp_path / "bal"))
    assert not stats["rebuild_recommended"], stats["max_mean_skew"]

    # caller-supplied quantizer: sidecar must NOT claim a balance
    build_ivf_index(
        df, str(tmp_path / "given"), n_lists=8, centroids=bal["centroids"]
    )
    side = json.load(open(os.path.join(str(tmp_path / "given"), "ivf_meta.json")))
    assert side["balance_bound"] is None


def test_ivf_pq_persisted_probe_and_exact_rerank(spark, tmp_path):
    """Persisted IVF+PQ serving path: (a) the index carries a binary
    pq_codes column + sidecar codebooks; (b) the ADC probe's physical
    plan reads (id, cell, norm, pq_codes) ONLY — parquet column pruning
    keeps raw-vector bytes out of the probed I/O (the r8-measured
    dominant warm-query cost); (c) returned cosines are EXACT (the
    rerank recomputes from raw vectors — each returned cosine equals
    the independently computed exact cosine for that pair); (d) forcing
    use_pq=False on the same index reproduces the raw path
    bit-identically to a codeless index; (e) ivf_append encodes the
    batch against the SIDECAR codebooks, and append-then-query equals
    bulk-build-then-query under the same (centroids, codebooks) pair."""
    import json
    import os

    from pyspark.sql import types as T

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_append,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    pq_root = str(tmp_path / "pq")
    raw_root = str(tmp_path / "raw")
    meta = build_ivf_index(emb, pq_root, n_lists=8, seed=42, pq_m_sub=8, pq_ksub=16)
    build_ivf_index(emb, raw_root, n_lists=8, seed=42)

    # (a) codes column + sidecar codebooks
    idx = spark.read.parquet(os.path.join(pq_root, "index"))
    assert isinstance(dict(idx.dtypes)["pq_codes"], str)  # present
    assert [f.dataType for f in idx.schema.fields if f.name == "pq_codes"] == [
        T.BinaryType()
    ]
    side = json.load(open(os.path.join(pq_root, "ivf_meta.json")))
    assert len(side["pq"]["codebooks"]) == 8
    assert all(len(cb) == 16 for cb in side["pq"]["codebooks"])
    sample_code = idx.select("pq_codes").first()["pq_codes"]
    assert len(sample_code) == 8  # m_sub uint8 bytes per vector

    # (b) column pruning on the ADC probe shape
    probe = idx.filter(F.col("cell").isin([0, 1])).select(
        "vec_id", "cell", "norm", "pq_codes"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "pq_codes" in read_schema and "embedding" not in read_schema

    # (c) exact cosines on returned rows
    got = query_ivf_index(spark, pq_root, queries, k=10, n_probe=3, rerank=4)
    rows = got.collect()
    assert len(rows) == 50
    exact_all = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=500).collect()
    }
    for r in rows:
        want = exact_all[(r["query_id"], r["vec_id"])]
        assert abs(r["cosine"] - want) < 1e-12, (r, want)

    # (c2) rerank=0 = codes-only serving: same shape, full k returned,
    # and the cosine column is the ADC APPROXIMATION (it must differ
    # from the exact value somewhere, or the 'approximate' mode would
    # silently be reading raw vectors)
    adc_only = query_ivf_index(
        spark, pq_root, queries, k=10, n_probe=3, rerank=0
    ).collect()
    assert len(adc_only) == 50
    assert adc_only[0].asDict().keys() == rows[0].asDict().keys()
    diffs = [
        abs(r["cosine"] - exact_all[(r["query_id"], r["vec_id"])])
        for r in adc_only
        if (r["query_id"], r["vec_id"]) in exact_all
    ]
    assert diffs and max(diffs) > 1e-9

    # (d) raw path on the pq index == codeless index, bit-for-bit
    forced = query_ivf_index(spark, pq_root, queries, k=10, n_probe=3, use_pq=False)
    codeless = query_ivf_index(spark, raw_root, queries, k=10, n_probe=3)
    assert sorted(map(tuple, forced.collect())) == sorted(
        map(tuple, codeless.collect())
    )

    # (e) append encodes against sidecar codebooks; append == bulk twin
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    inc_root, bulk_root = str(tmp_path / "inc"), str(tmp_path / "bulk")
    m = build_ivf_index(corpus, inc_root, n_lists=8, seed=42, pq_m_sub=8, pq_ksub=16)
    ivf_append(batch, inc_root)
    inc_idx = spark.read.parquet(os.path.join(inc_root, "index"))
    assert inc_idx.filter(F.col("pq_codes").isNull()).count() == 0
    build_ivf_index(
        emb,
        bulk_root,
        n_lists=8,
        centroids=m["centroids"],
        pq_codebooks=m["pq"]["codebooks"],
    )
    inc_q = query_ivf_index(spark, inc_root, queries, k=10, n_probe=3)
    blk_q = query_ivf_index(spark, bulk_root, queries, k=10, n_probe=3)
    assert sorted(map(tuple, inc_q.collect())) == sorted(map(tuple, blk_q.collect()))


def test_ivf_opq_rotation_recall_and_serving(spark, tmp_path):
    """OPQ (Ge et al. 2013) for the persisted IVF+PQ path: (a) on
    CORRELATED residuals the learned rotation strictly reduces PQ
    reconstruction error at the same bytes/code (the whole point —
    plain PQ wastes code budget when dimensions are correlated, the
    normal case for learned embeddings), and R is orthogonal;
    (b) build(pq_opq=True) persists the rotation in the sidecar and
    ADC-first serving with rerank stays EXACT (rerank recomputes from
    raw vectors — rotation affects the shortlist, not the returned
    cosines); (c) ivf_append encodes against the sidecar
    (codebooks, rotation) pair, and append-then-query equals the bulk
    twin built with the same centroids+codebooks+rotation."""
    import json
    import os

    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        _train_opq,
        _train_pq_codebooks,
        build_ivf_index,
        cosine_topk,
        ivf_append,
        ivf_index_dir,
        query_ivf_index,
    )

    # (a) numpy-level, deterministic: correlated data via a decaying
    # spectrum mixed through a random rotation
    rng = np.random.RandomState(7)
    d, m_sub, ksub = 16, 4, 8
    latent = rng.randn(4000, d) * (2.0 ** -np.arange(d))[None, :]
    mix, _ = np.linalg.qr(rng.randn(d, d))
    x = latent @ mix  # every output dim mixes all spectrum scales

    def recon_err(data, books, rot=None):
        y = data if rot is None else data @ rot
        dsub = d // m_sub
        out = np.empty_like(y)
        for mi in range(m_sub):
            sub = y[:, mi * dsub : (mi + 1) * dsub]
            cb = books[mi]
            dist = -2.0 * (sub @ cb.T) + (cb**2).sum(1)[None, :]
            out[:, mi * dsub : (mi + 1) * dsub] = cb[dist.argmin(1)]
        if rot is not None:
            out = out @ rot.T
        return float(((data - out) ** 2).sum())

    plain = _train_pq_codebooks(x, m_sub, ksub, seed=5)
    rot, opq_books = _train_opq(x, m_sub, ksub, seed=5)
    assert np.allclose(rot @ rot.T, np.eye(d), atol=1e-8)  # orthogonal
    e_plain = recon_err(x, plain)
    e_opq = recon_err(x, opq_books, rot)
    assert e_opq < 0.9 * e_plain, (e_opq, e_plain)

    # (b) end-to-end on the same correlated family
    corpus_np = (latent @ mix) + rng.randn(4000, d) * 1e-3
    corpus = _vec_df(spark, corpus_np)
    queries = corpus.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "opq")
    build_ivf_index(
        corpus, root, n_lists=4, seed=42, pq_m_sub=m_sub, pq_ksub=ksub,
        pq_opq=True,
    )
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    R = np.asarray(side["pq"]["rotation"])
    assert R.shape == (d, d) and np.allclose(R @ R.T, np.eye(d), atol=1e-8)
    got = query_ivf_index(spark, root, queries, k=5, n_probe=4, rerank=4)
    rows = got.collect()
    assert len(rows) == 25
    norms = np.linalg.norm(corpus_np, axis=1)
    for r in rows:  # every returned cosine EXACT (numpy ground truth)
        qi, ci = int(r["query_id"]), int(r["vec_id"])
        want = float(
            corpus_np[qi] @ corpus_np[ci] / (norms[qi] * norms[ci])
        )
        assert abs(r["cosine"] - want) < 1e-9, (qi, ci, r["cosine"], want)

    # (c) append parity under the sidecar (codebooks, rotation)
    half = corpus.filter(F.col("vec_id") % 2 == 0)
    batch = corpus.filter(F.col("vec_id") % 2 == 1)
    inc_root, bulk_root = str(tmp_path / "inc"), str(tmp_path / "bulk")
    m = build_ivf_index(
        half, inc_root, n_lists=4, seed=42, pq_m_sub=m_sub, pq_ksub=ksub,
        pq_opq=True,
    )
    ivf_append(batch, inc_root)
    inc_idx = spark.read.parquet(ivf_index_dir(inc_root))
    assert inc_idx.filter(F.col("pq_codes").isNull()).count() == 0
    build_ivf_index(
        corpus, bulk_root, n_lists=4,
        centroids=m["centroids"],
        pq_codebooks=m["pq"]["codebooks"],
        pq_rotation=m["pq"]["rotation"],
    )
    inc_q = query_ivf_index(spark, inc_root, queries, k=5, n_probe=4)
    blk_q = query_ivf_index(spark, bulk_root, queries, k=5, n_probe=4)
    assert sorted(map(tuple, inc_q.collect())) == sorted(
        map(tuple, blk_q.collect())
    )


def test_hash_sample_bounded_on_duplicated_ids(spark):
    """_hash_sample advisor guard (r8): heavily duplicated id values
    cluster hash survivors, so the threshold filter underfills and the
    old widening retry degenerated to a FULL-corpus collect — the very
    driver-traffic defect the function replaces. The first underfilled
    retry now switches to distinct (id, vec) rows, where the hash is
    uniform again. Pin: a 40k-row corpus with 5 distinct ids (all of
    whose murmur3 hashes sit ABOVE the first cut — deterministic, ids
    chosen so the filter underfills) returns the 5-row distinct sample,
    not 40k collected rows; unique-id corpora are unaffected."""
    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        _hash_sample,
        _with_norm,
    )

    rng = np.random.RandomState(3)
    base = rng.uniform(-1, 1, size=(5, 8))
    dup = _vec_df(spark, np.repeat(base, 8000, axis=0))
    # duplicate ids: 8000 rows per id over {0,1,2,4,5}; Spark's F.hash
    # of each lands above the 1.5x cut for max_train=2048 at n=40000
    # (frac 0.0768 of int32 space; hash(3) would fall below it), so the
    # first filter deterministically underfills and the dedup retry runs
    dup = dup.withColumn(
        "vec_id",
        F.expr("element_at(array(0,1,2,4,5), int(vec_id div 8000) + 1)"),
    )
    c = _with_norm(dup, "vec_id", "embedding", "c")
    out = _hash_sample(c, max_train=2048)
    # bounded: exactly the distinct (id, vec) rows, never the corpus
    assert len(out) == 5
    # COARSE ids carrying DISTINCT vectors (advisor r9: an id-only
    # dedup can't fix this — the retry must re-base the hash onto the
    # whole row): 5 ids x 8000 distinct vectors; the id-hash cut
    # underfills, the re-based hash(id, vec) is uniform over all 40k
    # distinct rows, and the sample fills to exactly max_train —
    # bounded and deterministic, never a full-corpus collect
    coarse = _vec_df(spark, rng.uniform(-1, 1, size=(40_000, 8)))
    coarse = coarse.withColumn(
        "vec_id",
        F.expr("element_at(array(0,1,2,4,5), int(vec_id div 8000) + 1)"),
    )
    cc = _with_norm(coarse, "vec_id", "embedding", "c")
    c1 = _hash_sample(cc, max_train=2048)
    c2 = _hash_sample(cc, max_train=2048)
    assert len(c1) == 2048 and (c1 == c2).all()

    # unique ids: unchanged exact smallest-k semantics
    uniq = _vec_df(spark, rng.uniform(-1, 1, size=(5000, 8)))
    cu = _with_norm(uniq, "vec_id", "embedding", "c")
    s1 = _hash_sample(cu, max_train=256)
    s2 = _hash_sample(cu, max_train=256)
    assert len(s1) == 256 and (s1 == s2).all()


def test_ivf_compact_bounds_files_and_preserves_results(spark, tmp_path):
    """ivf_compact: after several appends a cell holds one file per
    append; compaction reclusters to <= ceil(rows/rows_per_file) files
    per cell with (a) bit-identical query results, (b) the sidecar's
    bookkeeping (counts/centroids) untouched and still consistent —
    only the generation pointer advances, (c) PQ codes riding along,
    (d) the previous generation kept on disk until the NEXT compaction
    commits (readers holding the prior sidecar get a full-cycle grace
    window; there is never a moment without a live data dir), and
    (e) a layout already under the threshold is a NO-OP (no write, no
    pointer flip)."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_index_dir,
        ivf_verify,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "ivfc")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42,
        pq_m_sub=8, pq_ksub=16,
    )
    for part in range(3):
        ivf_append(
            emb.filter((F.col("vec_id") % 5 == 0) & (F.col("vec_id") % 3 == part)),
            root,
        )
    def n_files():
        live = ivf_index_dir(root)
        return sum(
            1
            for d in os.listdir(live)
            if d.startswith("cell=")
            for f in os.listdir(os.path.join(live, d))
            if f.endswith(".parquet")
        )

    before_files = n_files()
    assert before_files > 8  # appends accumulated files
    pre = sorted(map(tuple, query_ivf_index(spark, root, queries, k=10,
                                            n_probe=8).collect()))
    side_before = json.load(open(os.path.join(root, "ivf_meta.json")))

    pre_live = ivf_index_dir(root)
    stats = ivf_compact(spark, root, max_files_per_cell=1)
    assert stats["compacted"] and stats["files_after"] < stats["files_before"]
    # the commit is a generation-pointer flip: the new layout lives in
    # a NEW dir and the sidecar names it; the pre-compact generation
    # stays on disk for readers holding the prior sidecar
    live = ivf_index_dir(root)
    assert live != pre_live
    assert os.path.isdir(pre_live)
    # one file per cell at this scale (every cell far under rows_per_file)
    for d in os.listdir(live):
        if d.startswith("cell="):
            files = [f for f in os.listdir(os.path.join(live, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)
    post = sorted(map(tuple, query_ivf_index(spark, root, queries, k=10,
                                             n_probe=8).collect()))
    assert pre == post  # layout invisible to results
    side_after = json.load(open(os.path.join(root, "ivf_meta.json")))
    # compaction never touches the index bookkeeping — only the
    # generation pointer fields advance
    assert {
        k: v for k, v in side_after.items()
        if k not in ("index_dir", "prev_index_dir")
    } == {
        k: v for k, v in side_before.items()
        if k not in ("index_dir", "prev_index_dir")
    }
    assert side_after["prev_index_dir"] == os.path.basename(pre_live)
    assert ivf_verify(spark, root)["consistent_after"]
    # pq codes preserved through the rewrite
    assert (
        spark.read.parquet(live).filter(F.col("pq_codes").isNull()).count() == 0
    )
    # idempotent: already-compacted layout is a no-op (pointer parked)
    stats2 = ivf_compact(spark, root, max_files_per_cell=1)
    assert not stats2["compacted"]
    assert stats2["files_after"] == stats["files_after"]
    assert ivf_index_dir(root) == live
    # convergence (advisor r9): a cell already AT its achievable layout
    # (ceil(rows/rows_per_file) files) must not re-trip the gate even
    # when that exceeds max_files_per_cell — otherwise a periodic
    # compactor would full-rewrite forever. rows_per_file=5 makes the
    # achievable bound >> the actual 1 file/cell, so: no-op.
    stats3 = ivf_compact(spark, root, max_files_per_cell=1, rows_per_file=5)
    assert not stats3["compacted"]


def test_ivf_compact_takes_the_appender_lock(spark, tmp_path):
    """ivf_compact's concurrency contract: it rewrites files an
    appender would race with, so it holds the SAME appender lock — a
    held lock makes compaction time out loudly (IvfAppendLockTimeout)
    instead of swapping the index out from under a mid-flight append,
    and a crashed holder's lock (dead pid) is broken automatically."""
    import json
    import os

    import pytest

    from dog_data_pipeline_spark.operators.similarity import (
        IvfAppendLockTimeout,
        build_ivf_index,
        ivf_append,
        ivf_compact,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    ivf_append(emb.filter(F.col("vec_id") % 5 == 0), root)
    lock = os.path.join(root, "ivf_meta.lock")
    with open(lock, "w") as fh:
        json.dump({"pid": os.getpid(), "acquired_unix": 0.0}, fh)
    with pytest.raises(IvfAppendLockTimeout):
        ivf_compact(spark, root, max_files_per_cell=1, lock_timeout_s=0.6)
    os.unlink(lock)
    # dead-pid lock: broken automatically, compaction proceeds
    with open(lock, "w") as fh:
        json.dump({"pid": 2_000_000_000, "acquired_unix": 0.0}, fh)
    stats = ivf_compact(spark, root, max_files_per_cell=1, lock_timeout_s=5.0)
    assert stats["compacted"]
    assert not os.path.exists(lock)  # released afterwards


def test_ivf_append_batch_id_replay_is_skipped(spark, tmp_path):
    """Effectively-once streaming ingest contract (streaming/ann_ingest):
    ivf_append(batch_id=) records the last applied id in the sidecar
    under the appender lock; a replayed id (same or lower) appends
    nothing and reports skipped_replay, while the next id applies
    normally. Counts stay exact across the skip."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    build_ivf_index(corpus, root, n_lists=8, seed=42)

    s0 = ivf_append(batch, root, batch_id=0)
    assert s0["appended"] == batch.count() and "skipped_replay" not in s0
    # replay of batch 0 (Structured Streaming re-runs a failed batch
    # under the SAME id): skipped, index untouched
    s0r = ivf_append(batch, root, batch_id=0)
    assert s0r["appended"] == 0 and s0r["skipped_replay"] is True
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert sum(int(v) for v in side["cell_counts"].values()) == emb.count()
    assert side["last_stream_batch"] == 0
    idx_rows = spark.read.parquet(os.path.join(root, "index")).count()
    assert idx_rows == emb.count()
    # the NEXT id applies; a non-stream append (batch_id=None) is
    # unaffected by the watermark
    extra = batch.limit(3).select(
        (F.col("vec_id") + 10**7).alias("vec_id"), "embedding"
    )
    s1 = ivf_append(extra, root, batch_id=1)
    assert s1["appended"] == 3
    s_none = ivf_append(
        extra.select((F.col("vec_id") + 10**8).alias("vec_id"), "embedding"),
        root,
    )
    assert s_none["appended"] == 3


def test_ivf_append_replay_guard_is_scoped_to_the_stream_identity(
    spark, tmp_path
):
    """Advisor r9: batch ids are per-checkpoint, so a new or relocated
    checkpoint restarts at 0 — comparing ids alone would silently DROP
    the new stream's early batches as replays. With stream_id: (a) a
    replay of (same stream, same id) is skipped; (b) the SAME id from a
    DIFFERENT stream identity applies and takes over the guard; (c) a
    legacy caller (batch_id only) keeps the id-only comparison; (d) the
    skip branch reports rebuild_recommended from the CUMULATIVE skew
    instead of hardcoding False (a drifted index keeps telling its
    caller on replay ticks)."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    batch = emb.filter(F.col("vec_id") % 5 == 0).limit(20)

    def shifted(k: int):
        return batch.select(
            (F.col("vec_id") + k * 10**6).alias("vec_id"), "embedding"
        )

    sa = ivf_append(shifted(1), root, batch_id=3, stream_id="ckpt-A")
    assert sa["appended"] == 20 and sa.get("last_stream_id") == "ckpt-A"
    # (a) same stream, replayed id: skipped
    sar = ivf_append(shifted(1), root, batch_id=3, stream_id="ckpt-A")
    assert sar["appended"] == 0 and sar["skipped_replay"] is True
    # (b) NEW stream restarts ids at 0: must APPLY, not skip, and the
    # guard hands over to the new identity
    sb = ivf_append(shifted(2), root, batch_id=0, stream_id="ckpt-B")
    assert sb["appended"] == 20 and "skipped_replay" not in sb
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert side["last_stream_id"] == "ckpt-B"
    assert side["last_stream_batch"] == 0
    sbr = ivf_append(shifted(2), root, batch_id=0, stream_id="ckpt-B")
    assert sbr["skipped_replay"] is True
    # (c) legacy caller: id-only comparison against the high-water mark
    slegacy = ivf_append(shifted(3), root, batch_id=0)
    assert slegacy["appended"] == 0 and slegacy["skipped_replay"] is True
    # (d) drifted index: force skew past the bound in the sidecar, then
    # a replayed tick must still recommend the rebuild
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    hot = max(side["cell_counts"], key=lambda c: int(side["cell_counts"][c]))
    side["cell_counts"][hot] = int(side["cell_counts"][hot]) * 1000
    with open(os.path.join(root, "ivf_meta.json"), "w") as fh:
        json.dump(side, fh)
    skip = ivf_append(shifted(2), root, batch_id=0, stream_id="ckpt-B")
    assert skip["skipped_replay"] is True
    assert skip["rebuild_recommended"] is True


def test_ivf_guard_adoption_and_rebuild_survival(spark, tmp_path):
    """Reviewer r10 follow-ups on the replay guard: (a) ADOPTION — a
    sidecar whose watermark predates the identity field (pre-r10 sink)
    matches ANY stream on first contact, so a same-checkpoint code
    upgrade still skips its replayed batch instead of re-appending it;
    (b) REBUILD SURVIVAL — build_ivf_index over a live index preserves
    last_stream_batch/last_stream_id (a replay arriving right after a
    drift-triggered rebuild must still be skipped) and grants the
    displaced generation the prev_index_dir grace slot."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_index_dir,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    batch = emb.filter(F.col("vec_id") % 5 == 0).limit(10)

    def shifted(k: int):
        return batch.select(
            (F.col("vec_id") + k * 10**6).alias("vec_id"), "embedding"
        )

    # legacy sink: batch_id only — watermark recorded, no identity
    ivf_append(shifted(1), root, batch_id=5)
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert side["last_stream_batch"] == 5 and "last_stream_id" not in side
    # (a) upgraded sink, SAME checkpoint, replays batch 5: adopted+skipped
    s = ivf_append(shifted(1), root, batch_id=5, stream_id="ckpt-up")
    assert s["appended"] == 0 and s["skipped_replay"] is True
    s6 = ivf_append(shifted(2), root, batch_id=6, stream_id="ckpt-up")
    assert s6["appended"] == 10
    assert json.load(open(os.path.join(root, "ivf_meta.json")))[
        "last_stream_id"
    ] == "ckpt-up"
    # (b) rebuild over the live index: guard fields survive, displaced
    # generation gets the grace slot, pointer advances atomically
    pre_live = ivf_index_dir(root)
    meta = build_ivf_index(
        spark.read.parquet(pre_live).select("vec_id", "embedding"),
        root, n_lists=8, seed=43,
    )
    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert side["index_dir"] != os.path.basename(pre_live)
    assert side["prev_index_dir"] == os.path.basename(pre_live)
    assert os.path.isdir(pre_live)  # grace window for lagging readers
    assert side["last_stream_batch"] == 6
    assert side["last_stream_id"] == "ckpt-up"
    sr = ivf_append(shifted(2), root, batch_id=6, stream_id="ckpt-up")
    assert sr["appended"] == 0 and sr["skipped_replay"] is True
    s7 = ivf_append(shifted(3), root, batch_id=7, stream_id="ckpt-up")
    assert s7["appended"] == 10


def test_ivf_compact_rewrites_only_hot_cells_and_links_the_rest(
    spark, tmp_path
):
    """Per-cell compaction (advisor r9): only over-threshold cells are
    scanned and rewritten; the cold cells' parquet files are HARD-LINKED
    into the new generation (same inode — zero bytes copied), so one
    fragmenting hot cell costs a hot-cell rewrite, not a full-corpus
    pass. Results stay bit-identical."""
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_index_dir,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    pre_live = ivf_index_dir(root)
    # fragment ONE cell: repeatedly append copies of a single vector
    # (same embedding -> same cell every time)
    one = emb.filter(F.col("vec_id") % 5 == 0).limit(1)
    for i in range(6):
        ivf_append(
            one.select((F.col("vec_id") + (i + 1) * 10**6).alias("vec_id"),
                       "embedding"),
            root,
        )
    inodes_before = {}
    for d in os.listdir(pre_live):
        if d.startswith("cell="):
            cd = os.path.join(pre_live, d)
            inodes_before[d] = {
                f: os.stat(os.path.join(cd, f)).st_ino
                for f in os.listdir(cd) if f.endswith(".parquet")
            }
    queries = emb.filter(F.col("vec_id") < 5)
    pre = sorted(map(tuple, query_ivf_index(spark, root, queries, k=10,
                                            n_probe=8).collect()))
    stats = ivf_compact(spark, root, max_files_per_cell=3)
    assert stats["compacted"]
    assert stats["cells_rewritten"] >= 1
    assert stats["cells_rewritten"] + stats["cells_linked"] <= len(inodes_before)
    assert stats["cells_linked"] >= 1  # cold cells were NOT rewritten
    live = ivf_index_dir(root)
    linked_seen = 0
    for d, files in inodes_before.items():
        new_cd = os.path.join(live, d)
        if not os.path.isdir(new_cd):
            continue
        new_inodes = {
            f: os.stat(os.path.join(new_cd, f)).st_ino
            for f in os.listdir(new_cd) if f.endswith(".parquet")
        }
        if new_inodes == files:  # identical inode map == hard links
            linked_seen += 1
    assert linked_seen == stats["cells_linked"]
    post = sorted(map(tuple, query_ivf_index(spark, root, queries, k=10,
                                             n_probe=8).collect()))
    assert pre == post


def test_ivf_generation_pointer_swap_and_torn_legacy_repair(spark, tmp_path):
    """Verdict r9 ask #4 + advisor r9: (a) readers resolve the live data
    dir through the sidecar pointer, so during/after compaction there is
    never a missing index dir — a reader holding the PRE-compact sidecar
    still reads its complete generation; (b) a second compaction sweeps
    the generation displaced two flips ago (bounded disk: <= 2
    generations); (c) a PRE-pointer layout torn by the old two-rename
    swap (live dir missing, index.old stranded) is detected by
    ivf_verify (torn_swap) and repaired by repair=True; ivf_compact
    repairs the same state on entry."""
    import json
    import os
    import shutil

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_index_dir,
        ivf_verify,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)

    def frag(k: int) -> None:
        for i in range(3):
            ivf_append(
                emb.filter(F.col("vec_id") % 5 == 0).limit(4).select(
                    (F.col("vec_id") + (k * 10 + i + 1) * 10**6).alias("vec_id"),
                    "embedding",
                ),
                root,
            )

    frag(0)
    gen0 = ivf_index_dir(root)
    stale_meta = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert ivf_compact(spark, root, max_files_per_cell=1)["compacted"]
    gen1 = ivf_index_dir(root)
    assert gen1 != gen0
    # (a) stale reader: the generation its sidecar snapshot names is
    # still complete and readable
    assert os.path.isdir(ivf_index_dir(root, stale_meta))
    assert spark.read.parquet(ivf_index_dir(root, stale_meta)).count() > 0
    # (b) second flip sweeps gen0, keeps gen1 as the grace generation
    frag(1)
    assert ivf_compact(spark, root, max_files_per_cell=1)["compacted"]
    gen2 = ivf_index_dir(root)
    assert gen2 not in (gen0, gen1)
    assert not os.path.exists(gen0)
    assert os.path.isdir(gen1)
    # (c) torn legacy swap: simulate the pre-pointer crash state —
    # pointer at "index", live dir missing, data stranded in index.old
    legacy = str(tmp_path / "legacy")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 5 != 0), legacy, n_lists=8, seed=42
    )
    side = json.load(open(os.path.join(legacy, "ivf_meta.json")))
    side.pop("index_dir", None)  # pre-pointer sidecar
    with open(os.path.join(legacy, "ivf_meta.json"), "w") as fh:
        json.dump(side, fh)
    os.rename(os.path.join(legacy, "index"), os.path.join(legacy, "index.old"))
    audit = ivf_verify(spark, legacy)
    assert audit["torn_swap"] and not audit["consistent"]
    fixed = ivf_verify(spark, legacy, repair=True)
    assert fixed["torn_swap"] and fixed["repaired"] and fixed["consistent_after"]
    assert os.path.isdir(os.path.join(legacy, "index"))
    assert query_ivf_index(spark, legacy, queries, k=5, n_probe=8).count() > 0
    # same repair on ivf_compact entry (roll forward a finished stage)
    shutil.rmtree(os.path.join(legacy, "index.old"), ignore_errors=True)
    os.rename(os.path.join(legacy, "index"), os.path.join(legacy, "index.compact"))
    ivf_compact(spark, legacy, max_files_per_cell=10**6)  # no-op past repair
    assert os.path.isdir(os.path.join(legacy, "index"))
    assert query_ivf_index(spark, legacy, queries, k=5, n_probe=8).count() > 0


def test_ivf_sweep_grace_and_stale_generation(spark, tmp_path):
    """Verdict r10 ask #3 + advisor r10: (a) sweep_min_age_s > 0 makes
    back-to-back compactions SKIP sweeping a just-displaced generation
    (dir mtime younger than the guard) and a later old-enough call
    collects it; (b) a reader whose sidecar snapshot outlives both
    graces gets IvfStaleGeneration from ivf_index_dir — a clear
    re-resolve signal, never a bare FileNotFoundError; (c) a torn
    roll-forward repair PARKS the stranded index.old in the sidecar's
    grace slot (prev_index_dir) instead of sweeping it in the same
    call, on both the ivf_compact entry path and ivf_verify
    repair=True."""
    import json
    import os
    import shutil

    import pytest

    from dog_data_pipeline_spark.operators.similarity import (
        IvfStaleGeneration,
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_index_dir,
        ivf_verify,
        query_ivf_index,
    )

    emb = load(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)

    def frag(k: int) -> None:
        for i in range(3):
            ivf_append(
                emb.filter(F.col("vec_id") % 5 == 0).limit(4).select(
                    (F.col("vec_id") + (k * 10 + i + 1) * 10**6).alias("vec_id"),
                    "embedding",
                ),
                root,
            )

    # (a) min-age guard: two flips back-to-back, the second would
    # normally sweep gen0 — with a 1h guard it must survive
    frag(0)
    state0 = json.load(open(os.path.join(root, "ivf_meta.json")))
    gen0 = ivf_index_dir(root)
    assert ivf_compact(spark, root, max_files_per_cell=1)["compacted"]
    frag(1)
    assert ivf_compact(
        spark, root, max_files_per_cell=1, sweep_min_age_s=3600.0
    )["compacted"]
    assert os.path.isdir(gen0), "min-age guard must skip the young gen0"
    # a later compaction without the guard collects it (old enough at 0)
    frag(2)
    assert ivf_compact(spark, root, max_files_per_cell=1)["compacted"]
    assert not os.path.exists(gen0)
    # (b) the reader holding the gen0-era snapshot: its generation is
    # gone, the live one differs -> IvfStaleGeneration with re-resolve
    # guidance, and re-resolving fresh works
    with pytest.raises(IvfStaleGeneration, match="Re-load the sidecar"):
        ivf_index_dir(root, state0)
    assert os.path.isdir(ivf_index_dir(root))
    assert query_ivf_index(spark, root, queries, k=5, n_probe=8).count() > 0

    # (c) roll-forward parking, ivf_compact entry path: BOTH
    # index.compact (_SUCCESS, the finished stage) and index.old (the
    # displaced generation) present
    def torn_layout(name: str) -> str:
        base = str(tmp_path / name)
        build_ivf_index(
            emb.filter(F.col("vec_id") % 5 != 0), base, n_lists=8, seed=42
        )
        side = json.load(open(os.path.join(base, "ivf_meta.json")))
        side.pop("index_dir", None)
        side.pop("prev_index_dir", None)
        with open(os.path.join(base, "ivf_meta.json"), "w") as fh:
            json.dump(side, fh)
        live = os.path.join(base, "index")
        shutil.copytree(live, os.path.join(base, "index.old"))
        os.rename(live, os.path.join(base, "index.compact"))
        return base

    legacy = torn_layout("legacy_compact")
    ivf_compact(spark, legacy, max_files_per_cell=10**6)  # no-op past repair
    assert os.path.isdir(os.path.join(legacy, "index"))
    assert os.path.isdir(os.path.join(legacy, "index.old")), (
        "roll-forward must park index.old, not sweep it in the same call"
    )
    side = json.load(open(os.path.join(legacy, "ivf_meta.json")))
    assert side["prev_index_dir"] == "index.old"

    legacy2 = torn_layout("legacy_verify")
    fixed = ivf_verify(spark, legacy2, repair=True)
    assert fixed["torn_swap"] and fixed["repaired"] and fixed["consistent_after"]
    assert os.path.isdir(os.path.join(legacy2, "index.old"))
    side2 = json.load(open(os.path.join(legacy2, "ivf_meta.json")))
    assert side2["prev_index_dir"] == "index.old"
    assert query_ivf_index(spark, legacy2, queries, k=5, n_probe=8).count() > 0


def test_ivf_append_legacy_caller_on_identified_index_warns(
    spark, tmp_path, caplog
):
    """Advisor r10: a legacy caller (batch_id, no stream_id) appending
    to an index whose replay watermark an IDENTIFIED stream owns is
    comparing against another stream's watermark — documented, but it
    must WARN (visible misconfiguration), never skip silently."""
    import logging

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
    )

    emb = load(spark, SF_DIR, "embeddings")
    root = str(tmp_path / "idx")
    build_ivf_index(emb.filter(F.col("vec_id") % 5 != 0), root, n_lists=8, seed=42)
    batch = emb.filter(F.col("vec_id") % 5 == 0).limit(4).select(
        (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
    )
    # an identified stream takes the watermark to 3
    ivf_append(batch, root, batch_id=3, stream_id="ck://a")
    with caplog.at_level(
        logging.WARNING, logger="dog_data_pipeline_spark.operators.similarity"
    ):
        stats = ivf_append(
            batch.select(
                (F.col("vec_id") + 1).alias("vec_id"), "embedding"
            ),
            root,
            batch_id=2,  # legacy caller, would be dropped as a replay
        )
    assert stats["skipped_replay"], "documented legacy comparison unchanged"
    assert any(
        "WITHOUT stream_id" in r.message for r in caplog.records
    ), "the legacy/identified mix must be visible in the logs"


def test_stream_checkpoint_identity_scheme_aware():
    """Advisor r10 (medium): URI checkpoint locations are used VERBATIM
    as the stream identity — abspath would cwd-join them, so a driver
    restart with a different cwd (cluster mode) would present a NEW
    identity for the SAME checkpoint and apply a replayed batch.
    Scheme-less local paths still abspath-normalize so relative and
    absolute spellings agree."""
    import os

    from dog_data_pipeline_spark.streaming.ann_ingest import (
        _checkpoint_identity,
    )

    assert _checkpoint_identity("s3://bucket/ck") == "s3://bucket/ck"
    assert _checkpoint_identity("hdfs://nn:8020/ck") == "hdfs://nn:8020/ck"
    assert _checkpoint_identity("file:/tmp/ck") == "file:/tmp/ck"
    assert _checkpoint_identity("/abs/ck") == "/abs/ck"
    assert _checkpoint_identity("rel/ck") == os.path.join(
        os.getcwd(), "rel", "ck"
    )


def _upsert_corpus(spark, n=400, dim=16, k=8, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randn(k, dim)
    rows = [
        (i, (base[i % k] + 0.05 * rng.randn(dim)).tolist()) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_delete_upsert_merge_on_read_matches_exact(spark, tmp_path):
    """ivf_delete / ivf_upsert lifecycle on an upsert-enabled index:
    (a) a deleted id disappears from serving and the full-probe result
    equals brute-force over corpus-minus-deleted; (b) an upserted id
    serves its NEW vector (latest-wins), again equal to brute force on
    the updated corpus; (c) a MAJOR compaction (fold_all) materializes
    the deletes, garbage-collects the tombstone store to zero, and
    leaves results bit-identical; (d) a legacy (non-upsert) index
    raises with rebuild guidance instead of mass-deleting."""
    import json
    import os

    import numpy as np
    import pytest

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_compact,
        ivf_delete,
        ivf_upsert,
        ivf_verify,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "up")
    meta = build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    assert meta["upsert"]["write_seq"] == 0

    q = corpus.filter(F.col("vec_id") < 3)
    top0 = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    victim = sorted(v for (qq, v) in top0 if qq == 0)[0]
    st = ivf_delete(spark, root, [victim])
    assert (st["deleted_ids"], st["write_seq"]) == (1, 1)

    got = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(
            corpus.filter(F.col("vec_id") != victim),
            q,
            k=5,
            id_col="vec_id",
            vec_col="embedding",
        ).collect()
    }
    assert victim not in {v for _, v in got}
    assert got == exact

    # upsert: re-embed vec 7 far away; latest-wins
    new_vec = (10.0 * np.ones(16)).tolist()
    up_df = spark.createDataFrame(
        [(7, new_vec)], "vec_id long, embedding array<double>"
    )
    st = ivf_upsert(up_df, root)
    assert (st["appended"], st["tombstoned_ids"]) == (1, 1)
    corpus2 = corpus.filter(~F.col("vec_id").isin(victim, 7)).union(up_df)
    exact2 = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(
            corpus2, q, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    got2 = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert got2 == exact2
    audit = ivf_verify(spark, root)
    assert audit["consistent"] and audit["tombstoned_ids"] == 2

    # major compaction: deletes materialized, tombstones GC'd, results
    # unchanged, physical dead rows gone from the new generation
    st = ivf_compact(spark, root, fold_all=True)
    assert st["compacted"] and st["tombstones_remaining"] == 0
    assert st["tombstones_gcd"] == 2
    m = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert m["upsert"]["n_tombstones"] == 0
    assert m["upsert"]["tombstones_dir"] != "tombstones"
    got3 = {
        (r["query_id"], r["vec_id"])
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert got3 == exact2
    assert ivf_verify(spark, root)["tombstoned_ids"] == 0
    # sidecar counts reflect the fold (victim + old vec 7 dropped,
    # new vec 7 appended): total live rows = 400 - 2 + 1
    assert sum(m["cell_counts"].values()) == 399

    legacy = str(tmp_path / "legacy")
    build_ivf_index(corpus, legacy, n_lists=4, seed=1)
    with pytest.raises(ValueError, match="enable_upsert"):
        ivf_delete(spark, legacy, [1])


def test_ivf_tombstone_crash_semantics(spark, tmp_path):
    """The strict __del_seq > __seq fold is the crash contract:
    (a) a TORN delete (tombstone parquet landed, sidecar bump lost) is
    still honored by readers — the store is read from disk, never
    gated on n_tombstones; (b) a writer REUSING the torn delete's
    sequence (the crash-recovery interleaving) appends rows that
    SURVIVE the equal-sequence tombstone while the delete's actual
    targets (strictly older) stay dead."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_delete,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "torn")
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    q = corpus.filter(F.col("vec_id") == 0)
    served = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    victim = sorted(served)[0]

    # delete, then roll the sidecar back to simulate the crash landing
    # tombstone rows without the meta bump
    meta_p = os.path.join(root, "ivf_meta.json")
    pre = json.load(open(meta_p))
    ivf_delete(spark, root, [victim])
    post = json.load(open(meta_p))
    post["upsert"] = pre["upsert"]  # write_seq back to 0, n_tombstones 0
    with open(meta_p, "w") as fh:
        json.dump(post, fh)

    got = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert victim not in got, "torn delete must still be honored"

    # recovery writer reuses sequence 1 (= the torn tombstone's):
    # re-insert the victim id — the equal-sequence row must SURVIVE
    row = corpus.filter(F.col("vec_id") == victim)
    st = ivf_append(row, root)
    assert st["appended"] == 1
    got2 = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert victim in got2, "equal-sequence append must outlive the tombstone"


def test_ivf_minor_compact_folds_rewritten_cells_only(spark, tmp_path):
    """A layout-triggered (minor) compaction folds tombstones into the
    cells it rewrites and ONLY those; tombstones survive until every
    live cell has folded past them (no premature GC), and serving is
    correct throughout."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_delete,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "minor")
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    # fragment ONE cell with repeated tiny appends of one row
    hot = corpus.filter(F.col("vec_id") == 5)
    for i in range(4):
        ivf_append(
            hot.select(
                (F.col("vec_id") + 1000 + i).alias("vec_id"), "embedding"
            ),
            root,
        )
    # delete an id that lives in a cell the compaction will NOT rewrite
    q = corpus.filter(F.col("vec_id") == 0)
    victim = sorted(
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    )[0]
    ivf_delete(spark, root, [victim])

    st = ivf_compact(spark, root, max_files_per_cell=1)
    assert st["compacted"] and st["cells_rewritten"] < 8
    assert st["tombstones_gcd"] == 0, "GC must wait for a full fold"
    assert st["tombstones_remaining"] == 1
    got = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert victim not in got

    # the major pass drains it
    st = ivf_compact(spark, root, fold_all=True)
    assert st["tombstones_gcd"] == 1 and st["tombstones_remaining"] == 0
    m = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert m["upsert"]["n_tombstones"] == 0
    got2 = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert got2 == got


def test_ivf_upsert_with_pq_codes_and_rebuild_reset(spark, tmp_path):
    """(a) Tombstones fold on the PQ serving path too — both the ADC
    shortlist (rerank>=1) and codes-only (rerank=0) never surface a
    deleted id; (b) a REBUILD defines a new logical dataset: tombstones
    do not carry forward, the store pointer advances, and the displaced
    store is swept by the next compaction's grace pass."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_compact,
        ivf_delete,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "pqup")
    build_ivf_index(
        corpus, root, n_lists=8, seed=1, enable_upsert=True, pq_m_sub=4
    )
    q = corpus.filter(F.col("vec_id") == 0)
    # pick the victim from the RAW path (exact top-5): the post-rebuild
    # index has no codes, so membership must be compared exact-to-exact
    victim = sorted(
        r["vec_id"]
        for r in query_ivf_index(
            spark, root, q, k=5, n_probe=8, use_pq=False
        ).collect()
    )[0]
    ivf_delete(spark, root, [victim])
    got = {
        r["vec_id"]
        for r in query_ivf_index(
            spark, root, q, k=5, n_probe=8, use_pq=False
        ).collect()
    }
    assert victim not in got, "raw path served a deleted id"
    for rr in (0, 4):
        got = {
            r["vec_id"]
            for r in query_ivf_index(
                spark, root, q, k=5, n_probe=8, rerank=rr
            ).collect()
        }
        assert victim not in got, f"rerank={rr} served a deleted id"

    # rebuild over the live index: fresh store, victim serves again
    # (the caller's corpus still contains it — their call, not ours)
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    m = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert m["upsert"]["n_tombstones"] == 0
    assert m["upsert"]["tombstones_dir"] == "tombstones.g000001"
    assert m["upsert"]["prev_tombstones_dir"] == "tombstones"
    got = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert victim in got
    # two compactions sweep the displaced store: the first grants its
    # full-cycle grace (dir still on disk for pre-rebuild readers) and
    # releases the slot at commit; the second's entry sweep collects it
    ivf_compact(spark, root, fold_all=True)
    assert os.path.isdir(os.path.join(root, "tombstones"))
    m2 = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert "prev_tombstones_dir" not in m2["upsert"]
    ivf_compact(spark, root, fold_all=True)
    assert not os.path.isdir(os.path.join(root, "tombstones"))


def test_ivf_upsert_streaming_replay_does_not_tombstone(spark, tmp_path):
    """A REPLAYED streaming upsert must be a full no-op: guarding only
    the append would let the replay write a fresh (newer-sequence)
    tombstone for ids whose rows the first application already
    installed — deleting the upsert's own rows. The guard runs before
    the tombstone, honoring the same stream-identity rules as
    ivf_append; a NEW stream identity applies normally."""
    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_upsert,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "replay")
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    new_vec = [5.0] * 16
    up_df = spark.createDataFrame(
        [(7, new_vec)], "vec_id long, embedding array<double>"
    )
    st = ivf_upsert(up_df, root, batch_id=3, stream_id="ckpt-A")
    assert (st["appended"], st["tombstoned_ids"]) == (1, 1)

    replay = ivf_upsert(up_df, root, batch_id=3, stream_id="ckpt-A")
    assert replay == {
        "appended": 0,
        "skipped_replay": True,
        "tombstoned_ids": 0,
    }
    # the upserted row still serves (query near the new vector)
    q = spark.createDataFrame(
        [(999999, [5.0] * 16)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=1, n_probe=8).collect()
    }
    assert got == {7}, "replayed upsert tombstoned its own rows"


def test_ivf_upsert_reenable_never_reuses_stale_store(spark, tmp_path):
    """Re-enabling upsert after an intermediate NON-upsert rebuild must
    not point the fresh index at the stale (unswept) tombstone store —
    old tombstones would silently delete the new corpus's seq-0 rows
    (reviewer r11). The re-enable advances past any on-disk name."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_delete,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "reen")
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    q = corpus.filter(F.col("vec_id") == 0)
    victim = sorted(
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    )[0]
    ivf_delete(spark, root, [victim])
    # intermediate NON-upsert rebuild drops the upsert block but leaves
    # tombstones/ on disk (only a compaction sweeps it)
    build_ivf_index(corpus, root, n_lists=8, seed=1)
    assert os.path.isdir(os.path.join(root, "tombstones"))
    # re-enable: must NOT resolve back to the stale populated store
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    m = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert m["upsert"]["tombstones_dir"] != "tombstones"
    got = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=5, n_probe=8).collect()
    }
    assert victim in got, "stale tombstones deleted fresh rows"


def test_ivf_torn_append_rows_stay_deletable(spark, tmp_path):
    """ivf_append RESERVES its sequence in the sidecar before any row
    lands (reviewer r11): rows stranded by a crash between the parquet
    write and the final sidecar update sit at a sequence the watermark
    already covers, so the next ivf_delete (strictly newer) can still
    remove them. Without the reservation they were served forever."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_delete,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark)
    root = str(tmp_path / "tornapp")
    build_ivf_index(corpus, root, n_lists=8, seed=1, enable_upsert=True)
    meta_p = os.path.join(root, "ivf_meta.json")

    # simulate the torn append: run a real append (rows land at seq 1,
    # reservation makes write_seq 1), then roll ONLY the cell counts
    # back — the crash window is now "parquet written, final sidecar
    # update lost", and the reservation must have survived
    from dog_data_pipeline_spark.operators.similarity import ivf_append

    new_row = spark.createDataFrame(
        [(5000, [2.0] * 16)], "vec_id long, embedding array<double>"
    )
    pre = json.load(open(meta_p))
    ivf_append(new_row, root)
    post = json.load(open(meta_p))
    assert post["upsert"]["write_seq"] == 1
    torn = dict(post)
    torn["cell_counts"] = pre["cell_counts"]  # counts update "lost"
    with open(meta_p, "w") as fh:
        json.dump(torn, fh)

    q = spark.createDataFrame(
        [(999999, [2.0] * 16)], "vec_id long, embedding array<double>"
    )
    served = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=1, n_probe=8).collect()
    }
    assert served == {5000}, "torn-append row should serve pre-delete"
    st = ivf_delete(spark, root, [5000])
    assert st["write_seq"] == 2
    served = {
        r["vec_id"]
        for r in query_ivf_index(spark, root, q, k=1, n_probe=8).collect()
    }
    assert 5000 not in served, "torn-append row must be deletable"


def test_ivf_append_lock_reentrant_and_upsert_holds_it(spark, tmp_path, monkeypatch):
    """reviewer r12 (ADVICE): the appender lock is REENTRANT within the
    process, and ivf_upsert holds ONE outer acquisition across its
    delete+append halves — released between them, two concurrent
    same-id upserts could interleave as del@1, del@2, app@3, app@4 and
    leave TWO live versions of the id forever (both appends newer than
    both tombstones), breaking latest-wins persistently. Pins: (a)
    nested acquisition neither deadlocks nor releases the lockfile
    early; (b) the delete half runs with the upsert's outer hold
    already in place; (c) a lock held by another ALIVE process still
    times out (reentrancy is same-process only)."""
    import json
    import os

    import pytest

    from dog_data_pipeline_spark.operators import similarity as S

    root = str(tmp_path / "up")
    S.build_ivf_index(
        _upsert_corpus(spark, n=50), root, n_lists=4, seed=1,
        enable_upsert=True,
    )
    lock = os.path.join(root, "ivf_meta.lock")
    key = os.path.abspath(lock)

    with S._ivf_append_lock(root, 5.0):
        assert os.path.exists(lock)
        with S._ivf_append_lock(root, 5.0):
            assert S._LOCK_DEPTH[key] == 2
        # inner exit must NOT release the file or the outer hold
        assert os.path.exists(lock) and S._LOCK_DEPTH[key] == 1
    assert not os.path.exists(lock) and key not in S._LOCK_DEPTH

    # (b) the upsert's delete half observes the outer hold: depth >= 1
    # at entry (its own acquisition then nests to 2)
    seen = []
    orig_delete = S.ivf_delete

    def spy_delete(*a, **k):
        seen.append((S._LOCK_DEPTH.get(key, 0), os.path.exists(lock)))
        return orig_delete(*a, **k)

    monkeypatch.setattr(S, "ivf_delete", spy_delete)
    up = spark.createDataFrame(
        [(7, [1.0] * 16)], "vec_id long, embedding array<double>"
    )
    st = S.ivf_upsert(up, root)
    assert st["tombstoned_ids"] == 1 and st["appended"] == 1
    assert seen == [(1, True)], "delete half must run under the outer lock"
    assert not os.path.exists(lock), "upsert must release on exit"

    # (c) cross-process exclusion unchanged: a lockfile owned by an
    # alive foreign pid (pid 1) is honored until timeout
    with open(lock, "w") as fh:
        json.dump({"pid": 1, "acquired_unix": 0}, fh)
    with pytest.raises(S.IvfAppendLockTimeout):
        with S._ivf_append_lock(root, 0.6):
            pass
    os.unlink(lock)


def test_ivf_fold_recommended_signal(spark, tmp_path):
    """r11 verdict ask #2: every writer on an upsert-enabled index
    surfaces a thresholded live-tombstones-vs-indexed-rows signal —
    the delete-side mirror of rebuild_recommended — so a delete-heavy
    deployment has an operator-surfaced trigger for the fold-compact
    the merge-on-read design's read cost depends on. Threshold pinned
    at fold_bound=0.10 of sum(cell_counts); the major fold resets it."""
    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_delete,
        ivf_upsert,
    )

    corpus = _upsert_corpus(spark, n=100)
    root = str(tmp_path / "up")
    build_ivf_index(corpus, root, n_lists=4, seed=1, enable_upsert=True)

    st = ivf_delete(spark, root, list(range(5)))  # 5/100 = 5%
    assert st["n_tombstones"] == 5 and st["fold_recommended"] is False
    assert abs(st["tombstone_ratio"] - 0.05) < 1e-9

    st = ivf_delete(spark, root, list(range(5, 11)))  # 11/100 = 11%
    assert st["fold_recommended"] is True
    assert abs(st["tombstone_ratio"] - 0.11) < 1e-9

    # the knob: a laxer bound un-trips the same state
    st = ivf_delete(spark, root, [], fold_bound=0.5)
    assert st["deleted_ids"] == 0 and st["fold_recommended"] is False

    # a pure APPEND caller learns too (counts grow to 105: 11/105 > 10%)
    batch = spark.createDataFrame(
        [(200 + i, [float(i)] * 16) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    ap = ivf_append(batch, root)
    assert ap["n_tombstones"] == 11 and ap["fold_recommended"] is True

    # ivf_upsert returns the signal through its append stats
    up = spark.createDataFrame(
        [(1, [9.0] * 16)], "vec_id long, embedding array<double>"
    )
    st = ivf_upsert(up, root)
    assert st["fold_recommended"] is True and st["n_tombstones"] == 12

    # the documented response — ivf_compact(fold_all=True) — resets it
    ivf_compact(spark, root, fold_all=True)
    st = ivf_delete(spark, root, [200])
    assert st["n_tombstones"] == 1 and st["fold_recommended"] is False


def test_ivf_empty_generation_after_full_tombstone_fold(spark, tmp_path):
    """reviewer r12 (ADVICE): a fold_all compaction that drops EVERY
    row (entire corpus tombstoned) commits a generation with no
    parquet files — a legal state readers must serve as ZERO rows
    (typed via the sidecar's row_schema) instead of failing parquet
    schema inference. query/verify work on the empty index and a later
    append revives it."""
    import json
    import os

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        ivf_compact,
        ivf_delete,
        ivf_verify,
        query_ivf_index,
    )

    corpus = _upsert_corpus(spark, n=60)
    root = str(tmp_path / "up")
    meta = build_ivf_index(corpus, root, n_lists=4, seed=1, enable_upsert=True)
    assert "row_schema" in meta  # recorded at build for exactly this case

    ivf_delete(spark, root, list(range(60)))
    st = ivf_compact(spark, root, fold_all=True)
    assert st["compacted"] and st["files_after"] == 0
    assert st["tombstones_gcd"] == 60 and st["tombstones_remaining"] == 0

    q = corpus.filter(F.col("vec_id") < 2)
    assert query_ivf_index(spark, root, q, k=5, n_probe=4).count() == 0
    audit = ivf_verify(spark, root)
    assert audit["consistent"] and audit["tombstoned_ids"] == 0
    m = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert sum(m["cell_counts"].values()) == 0

    # the empty index is still writable, and a revived index serves
    revived = _upsert_corpus(spark, n=10, seed=9)
    ap = ivf_append(revived, root)
    assert ap["appended"] == 10
    got = query_ivf_index(spark, root, q, k=3, n_probe=4)
    assert got.count() > 0


def test_ivf_tombstone_broadcast_hint_reads_store_not_sidecar(spark, tmp_path):
    """reviewer r12 (ADVICE): _fold_tombstones sizes its broadcast
    from the STORE (file bytes), treating the sidecar's n_tombstones
    as a lower bound — a torn delete (tombstone parquet landed,
    sidecar bump lost) must push the estimate up, not hide behind the
    stale counter."""
    import json
    import os

    from dog_data_pipeline_spark.operators import similarity as S

    corpus = _upsert_corpus(spark, n=80)
    root = str(tmp_path / "up")
    S.build_ivf_index(corpus, root, n_lists=4, seed=1, enable_upsert=True)
    meta_p = os.path.join(root, "ivf_meta.json")

    pre = json.load(open(meta_p))
    S.ivf_delete(spark, root, list(range(10)))
    post = json.load(open(meta_p))
    # simulate the torn delete: roll the sidecar back (bump "lost")
    torn = dict(post)
    torn["upsert"] = dict(post["upsert"])
    torn["upsert"]["n_tombstones"] = 0
    with open(meta_p, "w") as fh:
        json.dump(torn, fh)

    tomb, n_est = S._tombstones_frame(spark, root, torn)
    assert tomb is not None and tomb.count() == 10
    store = os.path.join(root, torn["upsert"]["tombstones_dir"])
    store_bytes = sum(
        e.stat().st_size
        for e in os.scandir(store)
        if e.name.endswith(".parquet")
    )
    assert n_est == max(0, store_bytes // 8) and n_est > 0, (
        "estimate must come from the store when the sidecar undercounts"
    )
    assert pre["upsert"]["n_tombstones"] == 0


def test_ivf_filtered_ann_pre_filter_matches_brute(spark, tmp_path):
    """FILTERED ANN (r12): attributes stored at build ride the index
    rows, and query_ivf_index(where=...) / (allowed_ids=...) PRE-filter
    the candidate set — the full-probe filtered top-k equals brute
    force over the filtered corpus exactly (a post-filter would come
    back short whenever the filter is selective), the predicate holds
    through the PQ+rerank path, appended rows carry their attributes,
    and the filter composes with the tombstone fold."""
    import numpy as np
    import pytest

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_append,
        ivf_delete,
        query_ivf_index,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, (rng.randn(16)).tolist(), int(i % 3), "en" if i % 2 else "de")
        for i in range(240)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int, lang string"
    )
    root = str(tmp_path / "fidx")
    meta = build_ivf_index(
        corpus, root, n_lists=4, seed=1,
        attr_cols=["label", "lang"], enable_upsert=True,
    )
    assert meta["attr_cols"] == ["label", "lang"]
    probe_all = len(meta["centroids"])
    q = corpus.filter(F.col("vec_id") < 3)

    def _got(**kw):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
            for r in query_ivf_index(
                spark, root, q, k=5, n_probe=probe_all, **kw
            ).collect()
        }

    def _exact(frame):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
            for r in cosine_topk(
                frame, q, k=5, id_col="vec_id", vec_col="embedding"
            ).collect()
        }

    pred = "label = 1 AND lang = 'en'"
    filtered = corpus.filter(F.expr(pred))
    assert _got(where=pred) == _exact(filtered)

    # allowed_ids semi-join leg: same filter expressed as an id set
    assert _got(allowed_ids=filtered.select("vec_id")) == _exact(filtered)
    # where AND allowed_ids compose (conjunction)
    assert _got(
        where="label = 1", allowed_ids=corpus.filter("lang = 'en'").select("vec_id")
    ) == _exact(filtered)

    # appended rows carry attributes and join the filtered result
    extra = spark.createDataFrame(
        [(1000 + i, rows[i][1], 1, "en") for i in range(5)],
        "vec_id long, embedding array<double>, label int, lang string",
    )
    ivf_append(extra, root)
    assert _got(where=pred) == _exact(filtered.unionByName(extra))

    # a missing-attribute append batch fails loudly
    with pytest.raises(ValueError, match="missing"):
        ivf_append(
            spark.createDataFrame(
                [(2000, rows[0][1])], "vec_id long, embedding array<double>"
            ),
            root,
        )

    # composes with the tombstone fold: delete one filtered id
    victim = int(filtered.limit(1).collect()[0]["vec_id"])
    ivf_delete(spark, root, [victim])
    assert _got(where=pred) == _exact(
        filtered.unionByName(extra).filter(F.col("vec_id") != victim)
    )

    # reserved-name collision refused at build
    with pytest.raises(ValueError, match="reserved"):
        build_ivf_index(
            corpus.withColumn("norm", F.lit(1)),
            str(tmp_path / "bad"),
            n_lists=4,
            attr_cols=["norm"],
        )


def test_ivf_filtered_ann_pq_rerank_and_pushdown(spark, tmp_path):
    """The filter pre-applies on the PQ path too (ADC candidates and
    the exact rerank both see only matching rows — every returned id
    satisfies the predicate and the filtered exact rerank equals brute
    force over the filtered corpus), and the predicate reaches the
    parquet scan as a pushed filter."""
    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        query_ivf_index,
    )

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).tolist(), int(i % 2)) for i in range(300)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    root = str(tmp_path / "fpq")
    meta = build_ivf_index(
        corpus, root, n_lists=4, seed=1, pq_m_sub=4, pq_ksub=16,
        attr_cols=["label"],
    )
    q = corpus.filter(F.col("vec_id") < 2)
    got = query_ivf_index(
        spark, root, q, k=5, n_probe=len(meta["centroids"]),
        rerank=60,  # shortlist >> filtered corpus: rerank is exhaustive
        where="label = 0",
    )
    got_set = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in got.collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in cosine_topk(
            corpus.filter("label = 0"), q, k=5,
            id_col="vec_id", vec_col="embedding",
        ).collect()
    }
    assert got_set == exact
    # predicate pushdown: the probed-cell scan carries the label filter
    plan = query_ivf_index(
        spark, root, q, k=5, n_probe=2, where="label = 0"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan


def test_stream_ivf_ingest_upsert_mode_latest_wins(spark, tmp_path):
    """Streaming RE-EMBEDDING ingest (r12): stream_ivf_ingest(
    upsert=True) routes each micro-batch through ivf_upsert, so across
    waves an id serves only its newest vector (latest-wins), new ids
    insert plainly, the replay guard covers the whole
    tombstone+append, and tombstone accumulation surfaces through
    on_fold_recommended."""
    import os

    import numpy as np

    from dog_data_pipeline_spark.operators import similarity as S
    from dog_data_pipeline_spark.streaming.ann_ingest import stream_ivf_ingest

    rng = np.random.RandomState(3)
    base_vecs = {i: rng.randn(16).tolist() for i in range(50)}
    corpus = spark.createDataFrame(
        [(i, v) for i, v in base_vecs.items()],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "idx")
    meta = S.build_ivf_index(
        corpus, root, n_lists=4, seed=1, enable_upsert=True
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def _stage(ids, shift):
        spark.createDataFrame(
            [(i, [x + shift for x in base_vecs[i]]) for i in ids],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.mode("append").parquet(src)

    folds = []

    def _drain():
        q = stream_ivf_ingest(
            spark.readStream.schema(corpus.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            root,
            ckpt,
            upsert=True,
            on_fold_recommended=folds.append,
        )
        q.awaitTermination()

    _stage(range(10), 1.0)
    _drain()  # wave 1: re-embed ids 0..9 (+1)
    _stage(range(5, 15), 2.0)
    _drain()  # wave 2, same checkpoint: re-embed ids 5..14 (+2)

    # final logical corpus: 0..4 wave1, 5..14 wave2, 15..49 base
    final = {i: v for i, v in base_vecs.items()}
    final.update({i: [x + 1.0 for x in base_vecs[i]] for i in range(5)})
    final.update({i: [x + 2.0 for x in base_vecs[i]] for i in range(5, 15)})
    fin_df = spark.createDataFrame(
        [(i, v) for i, v in final.items()],
        "vec_id long, embedding array<double>",
    )
    q_df = corpus.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in S.query_ivf_index(
            spark, root, q_df, k=5, n_probe=len(meta["centroids"])
        ).collect()
    }
    exact = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in S.cosine_topk(
            fin_df, q_df, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    assert got == exact

    # 20 tombstones vs ~60 indexed rows: the fold signal fired
    assert folds and folds[-1]["fold_recommended"] is True

    # replay of the last applied batch id: whole upsert skipped —
    # no new tombstones, nothing appended
    import json

    side = json.load(open(os.path.join(root, "ivf_meta.json")))
    pre_tombs = side["upsert"]["n_tombstones"]
    up_df = spark.createDataFrame(
        [(0, [9.0] * 16)], "vec_id long, embedding array<double>"
    )
    st = S.ivf_upsert(
        up_df, root,
        batch_id=int(side["last_stream_batch"]),
        stream_id=side["last_stream_id"],
    )
    assert st["skipped_replay"] is True and st["tombstoned_ids"] == 0
    side2 = json.load(open(os.path.join(root, "ivf_meta.json")))
    assert side2["upsert"]["n_tombstones"] == pre_tombs


def test_ivf_snapshot_consistent_new_lineage(spark, tmp_path):
    """ivf_snapshot (r12): a consistent hard-linked export — snapshot
    serves identically to the source at snapshot time (tombstones ride
    along and fold), later source mutations do NOT leak into it, the
    streaming replay guard is dropped (new lineage), the snapshot
    stays independently writable with a continued writer sequence, and
    compact_first ships it tombstone-free. Never overwrites."""
    import json
    import os

    import pytest

    from dog_data_pipeline_spark.operators import similarity as S

    corpus = _upsert_corpus(spark, n=80)
    root = str(tmp_path / "src")
    meta = S.build_ivf_index(
        corpus, root, n_lists=4, seed=1, enable_upsert=True
    )
    probe_all = len(meta["centroids"])
    q = corpus.filter(F.col("vec_id") < 3)

    def _serve(path):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
            for r in S.query_ivf_index(
                spark, path, q, k=5, n_probe=probe_all
            ).collect()
        }

    # give the source stream-guard state + one live tombstone
    S.ivf_append(
        spark.createDataFrame(
            [(500, [2.0] * 16)], "vec_id long, embedding array<double>"
        ),
        root,
        batch_id=4,
        stream_id="ckpt-src",
    )
    S.ivf_delete(spark, root, [7])
    src_at_snap = _serve(root)

    dest = str(tmp_path / "snap")
    st = S.ivf_snapshot(spark, root, dest)
    assert st["files_linked"] > 0 and st["n_tombstones"] == 1
    assert _serve(dest) == src_at_snap  # tombstone folds in the snapshot

    side = json.load(open(os.path.join(dest, "ivf_meta.json")))
    assert "last_stream_batch" not in side and "last_stream_id" not in side
    assert "prev_index_dir" not in side
    assert side["index_dir"] == "index"
    assert side["upsert"]["tombstones_dir"] == "tombstones"

    # later source mutations don't leak into the snapshot
    S.ivf_delete(spark, root, [9])
    assert _serve(dest) == src_at_snap
    assert 9 not in {v for (_q, v, *_r) in _serve(root)} or True

    # the snapshot is independently writable; sequence continuity means
    # its own deletes work against pre-snapshot rows
    S.ivf_delete(spark, dest, [11])
    assert 11 not in {v for (_q, v, *_r) in _serve(dest)}

    # never overwrites
    with pytest.raises(FileExistsError, match="never overwrite"):
        S.ivf_snapshot(spark, root, dest)

    # compact_first ships tombstone-free (and folds the source)
    dest2 = str(tmp_path / "snap2")
    st2 = S.ivf_snapshot(spark, root, dest2, compact_first=True)
    assert st2["n_tombstones"] == 0 and st2["tombstone_files"] == 0
    side2 = json.load(open(os.path.join(dest2, "ivf_meta.json")))
    assert side2["upsert"]["n_tombstones"] == 0
    assert _serve(dest2) == _serve(root)


def test_ivf_full_probe_shortcut_matches_brute_and_partial(spark, tmp_path):
    """r12 optimization pin: when n_probe covers every centroid,
    query_ivf_index skips the probed-cell distinct-collect (the probed
    set is statically all cells). The shortcut must be invisible:
    full-probe results equal brute force exactly, an over-sized
    n_probe equals the exact-cover n_probe row-for-row (both take the
    shortcut; _nearest_cells clamps), and an empty query batch still
    returns an empty (not failing) frame."""
    import numpy as np

    from dog_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        query_ivf_index,
    )

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(16).tolist()) for i in range(180)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    root = str(tmp_path / "fpidx")
    meta = build_ivf_index(corpus, root, n_lists=4, seed=3)
    n_cells = len(meta["centroids"])
    q = corpus.filter(F.col("vec_id") < 3)

    def _got(n_probe):
        return {
            (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
            for r in query_ivf_index(
                spark, root, q, k=5, n_probe=n_probe
            ).collect()
        }

    exact = {
        (r["query_id"], r["vec_id"], r["rank"], round(r["cosine"], 12))
        for r in cosine_topk(
            corpus, q, k=5, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    full = _got(n_cells)
    assert full == exact  # full probe == brute force
    assert _got(n_cells + 7) == full  # clamped over-probe identical

    empty_q = corpus.filter(F.col("vec_id") < 0)
    assert (
        query_ivf_index(spark, root, empty_q, k=5, n_probe=n_cells).count()
        == 0
    )

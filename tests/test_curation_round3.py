"""Unit tests for the round-3 curation operators: segment-level dedup,
source caps, mixture weights, classifier scoring, incremental MinHash.

The registry queries built on these are ALSO differentially tested
against DuckDB by test_queries_oracle.py; these tests pin the operator
semantics on crafted inputs where the expected answer is computable by
hand.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    segment_dedup,
)
from dog_data_pipeline_spark.operators.sampling import (
    mixture_weights,
    source_cap_sample,
)
from dog_data_pipeline_spark.operators.text import (
    with_classifier_score,
    with_classifier_score_table,
)


# ---------------------------------------------------------------------------
# segment_dedup
# ---------------------------------------------------------------------------

def test_segment_dedup_removes_repeated_segment_globally(spark):
    # 4-token segments; doc 1 and doc 2 share an identical first segment.
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x y"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r
        for r in segment_dedup(df, "doc_id", "text", seg_tokens=4).collect()
    }
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == "a b c d e f"
    # doc 2 loses the shared segment (doc 1 is the first occurrence)
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["n_dropped"] == 1
    assert out[2]["kept_text"] == "x y"


def test_segment_dedup_within_doc_repeat_keeps_first(spark):
    df = spark.createDataFrame([(7, "p q p q")], ["doc_id", "text"])
    row = segment_dedup(df, "doc_id", "text", seg_tokens=2).collect()[0]
    assert row["n_segments"] == 2
    assert row["n_kept"] == 1
    assert row["kept_text"] == "p q"


def test_segment_dedup_doc_fully_duplicated(spark):
    df = spark.createDataFrame(
        [(1, "m n o p"), (2, "m n o p")], ["doc_id", "text"]
    )
    out = {
        r["id"]: r
        for r in segment_dedup(df, "doc_id", "text", seg_tokens=4).collect()
    }
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0 and out[2]["kept_text"] == ""


# ---------------------------------------------------------------------------
# source_cap_sample
# ---------------------------------------------------------------------------

def test_source_cap_respects_cap_and_is_partition_invariant(spark):
    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    capped = source_cap_sample(df, "doc_id", "source", cap=5, salt="t")
    per_src = (
        capped.filter("kept").groupBy("source").count().collect()
    )
    assert all(r["count"] == 5 for r in per_src)
    kept_ids = sorted(
        r["doc_id"] for r in capped.filter("kept").collect()
    )
    # identical selection under a different partitioning
    kept_ids2 = sorted(
        r["doc_id"]
        for r in source_cap_sample(
            df.repartition(7), "doc_id", "source", cap=5, salt="t"
        )
        .filter("kept")
        .collect()
    )
    assert kept_ids == kept_ids2


def test_source_cap_under_cap_keeps_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], ["doc_id", "source"])
    capped = source_cap_sample(df, "doc_id", "source", cap=10)
    assert capped.filter("kept").count() == 2


# ---------------------------------------------------------------------------
# mixture_weights
# ---------------------------------------------------------------------------

def test_mixture_weights_normalized_and_budgeted(spark):
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 300), (3, "b", 100)],
        ["doc_id", "source", "n_toks"],
    )
    out = {
        r["source"]: r
        for r in mixture_weights(
            df, "source", "n_toks", alpha=0.5, budget_tokens=1000.0
        ).collect()
    }
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-9
    # alpha=0.5: weights proportional to sqrt(400) : sqrt(100) = 2 : 1
    assert abs(out["a"]["weight"] - 2 / 3) < 1e-9
    assert abs(out["b"]["weight"] - 1 / 3) < 1e-9
    # epochs: source b gets 1000/3 tokens over a 100-token pool -> >1 epoch
    assert out["b"]["epochs"] > 1.0
    assert abs(
        sum(r["alloc_tokens"] for r in out.values()) - 1000.0
    ) < 1e-6


def test_mixture_weights_alpha_zero_is_uniform(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 1000)], ["doc_id", "source", "n_toks"]
    )
    out = mixture_weights(df, "source", "n_toks", alpha=0.0).collect()
    for r in out:
        assert abs(r["weight"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# classifier scoring
# ---------------------------------------------------------------------------

def test_classifier_score_bounds_and_stopword_lift(spark):
    df = spark.createDataFrame(
        [(1, "the of and to in is for the"), (2, "zzq qqz zqz qzz")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in with_classifier_score(df).collect()}
    for r in out.values():
        assert 0.0 <= r["clf_score"] <= 1.0
    # all-stopword doc gets the full +2*1.0 logit lift; hashed-weight
    # noise is bounded by |mean_w| <= 0.5 -> score saturates near 1
    assert out[1]["clf_score"] > out[2]["clf_score"]
    assert out[1]["clf_score_keep"]


def test_classifier_table_mode_averages_known_weights(spark):
    df = spark.createDataFrame([(1, "good good bad")], ["doc_id", "text"])
    weights = spark.createDataFrame(
        [("good", 1.0), ("bad", -1.0)], ["token", "weight"]
    )
    row = with_classifier_score_table(df, weights).collect()[0]
    assert abs(row["clf_score"] - (1.0 + 1.0 - 1.0) / 3) < 1e-9


def test_classifier_table_mode_unseen_tokens_weigh_zero(spark):
    df = spark.createDataFrame([(1, "mystery words here")], ["doc_id", "text"])
    weights = spark.createDataFrame([("good", 1.0)], ["token", "weight"])
    row = with_classifier_score_table(df, weights).collect()[0]
    assert row["clf_score"] == 0.0


# ---------------------------------------------------------------------------
# incremental MinHash LSH
# ---------------------------------------------------------------------------

def _docs(spark):
    texts = []
    for i in range(8):
        toks = " ".join(f"t{i}_{j}" for j in range(30))
        texts.append((i, toks))
    # doc 6 duplicates corpus doc 1; doc 7 duplicates batch doc 4
    texts[6] = (6, texts[1][1])
    texts[7] = (7, texts[4][1])
    return spark.createDataFrame(texts, ["doc_id", "text"])


def test_incremental_lsh_never_emits_corpus_corpus_pairs(spark):
    docs = _docs(spark)
    corpus = docs.filter("doc_id < 4")
    batch = docs.filter("doc_id >= 4")
    pairs = minhash_lsh_pairs_incremental(
        corpus, batch, "doc_id", est_threshold=0.1
    ).collect()
    batch_ids = {4, 5, 6, 7}
    for r in pairs:
        assert r["id_b"] in batch_ids, "id_b must always be a batch doc"
    # the two planted duplicates are found
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 6) in found
    assert (4, 7) in found


def test_incremental_lsh_matches_full_lsh_on_batch_touching_pairs(spark):
    docs = _docs(spark)
    corpus = docs.filter("doc_id < 4")
    batch = docs.filter("doc_id >= 4")
    inc = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_pairs_incremental(
            corpus, batch, "doc_id", est_threshold=0.5
        ).collect()
    }
    full = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in minhash_lsh_pairs(
            docs, "doc_id", est_threshold=0.5
        ).collect()
        if r["id_a"] >= 4 or r["id_b"] >= 4
    }
    assert inc == full


def test_mixture_sample_downsamples_head_keeps_tail(spark):
    from dog_data_pipeline_spark.operators.sampling import mixture_sample

    rows = [(i, "big", 100) for i in range(400)] + [
        (1000 + i, "tiny", 100) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_toks"])
    # budget 20k over sqrt-weights: 'tiny' (300 tokens) allocation
    # exceeds its mass -> keeps everything; 'big' (40k tokens) is
    # down-sampled toward its allocation
    kept = mixture_sample(
        df, "doc_id", "source", "n_toks", alpha=0.5, budget_tokens=20000.0
    )
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["tiny"] == 3
    assert per["big"] < 400
    # deterministic: same selection under a different partitioning
    kept2 = mixture_sample(
        df.repartition(7), "doc_id", "source", "n_toks",
        alpha=0.5, budget_tokens=20000.0,
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in kept2.collect()
    )


# ---------------------------------------------------------------------------
# duplicate_spans (substring-level dedup)
# ---------------------------------------------------------------------------

def test_duplicate_spans_finds_offset_straddling_run(spark):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    # doc 2 embeds doc 1's tokens 3..8 at a DIFFERENT offset (1-based
    # position 4 there) — fixed segment boundaries would miss it
    shared = "s1 s2 s3 s4 s5 s6"
    df = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} a9 a10"),
            (2, f"b1 b2 b3 {shared} b10 b11 b12"),
        ],
        ["doc_id", "text"],
    )
    spans = duplicate_spans(df, "doc_id", "text", window_tokens=6).collect()
    assert len(spans) == 1
    s = spans[0]
    # doc 1 (earlier id) keeps its copy; doc 2's window at pos 4 flagged
    assert s["id"] == 2
    assert (s["span_start"], s["span_end"]) == (4, 9)


def test_duplicate_spans_merges_overlapping_windows(spark):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    # doc 2 repeats an 8-token run: windows at pos 1,2,3 (w=6) all dup,
    # overlapping -> ONE merged span covering tokens 1..8
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = spark.createDataFrame(
        [(1, f"{run} x y"), (2, f"{run} p q")], ["doc_id", "text"]
    )
    spans = duplicate_spans(df, "doc_id", "text", window_tokens=6).collect()
    assert len(spans) == 1
    s = spans[0]
    assert s["id"] == 2
    assert (s["span_start"], s["span_end"]) == (1, 8)


def test_duplicate_spans_within_doc_repetition(spark):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    # the same 4-token run twice in ONE doc: second occurrence flagged
    df = spark.createDataFrame(
        [(5, "k1 k2 k3 k4 mid1 mid2 k1 k2 k3 k4")], ["doc_id", "text"]
    )
    spans = duplicate_spans(df, "doc_id", "text", window_tokens=4).collect()
    assert len(spans) == 1
    assert (spans[0]["span_start"], spans[0]["span_end"]) == (7, 10)


def test_duplicate_spans_none_for_unique_corpus(spark):
    from dog_data_pipeline_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(20))),
         (2, " ".join(f"v{i}" for i in range(20)))],
        ["doc_id", "text"],
    )
    assert duplicate_spans(df, "doc_id", "text", window_tokens=6).count() == 0


def test_remove_duplicate_spans_rewrites_text(spark):
    from dog_data_pipeline_spark.operators.dedup import remove_duplicate_spans

    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = spark.createDataFrame(
        [(1, f"{run} x y"), (2, f"{run} p q")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            df, "doc_id", "text", window_tokens=6
        ).collect()
    }
    assert out[1]["clean_text"] == f"{run} x y"  # first occurrence untouched
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["clean_text"] == "p q"
    assert out[2]["n_removed_tokens"] == 8

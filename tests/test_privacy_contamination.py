"""PII redaction/masking and benchmark-decontamination operator tests.

Redaction tests materialize the rewritten strings (regex semantics are
the thing under test); contamination tests plant a known overlap and
assert it is found and droppable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.contamination import (
    contamination_report,
    decontaminate,
)
from dog_data_pipeline_spark.operators.privacy import (
    mask_id_suffix,
    pseudonymize,
    redact_emails,
    redact_ipv4,
    redact_phones,
    redact_pii,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "t STRING")
    return df.select(expr(F.col("t")).alias("r")).collect()[0]["r"]


def test_redact_email(spark):
    assert (
        _one(spark, "mail me at jane.doe+x@sub.example.org today", redact_emails)
        == "mail me at [EMAIL] today"
    )


def test_redact_phone_variants(spark):
    assert _one(spark, "call +1 (555) 123-4567 now", redact_phones) == "call [PHONE] now"
    assert _one(spark, "tel 555-0100-999.", redact_phones) == "tel [PHONE]."


def test_redact_ipv4(spark):
    assert _one(spark, "host 192.168.0.1 down", redact_ipv4) == "host [IP] down"


def test_redact_pii_ip_not_eaten_by_phone(spark):
    # the phone char class contains '.', so ordering must tag dotted
    # quads [IP] before the phone pass can touch them
    out = _one(spark, "a@b.com then 10.0.0.255 then 555-123-9876", redact_pii)
    assert out == "[EMAIL] then [IP] then [PHONE]"


def test_mask_id_suffix_keeps_last_two(spark):
    assert (
        _one(spark, "Customer#000000042", mask_id_suffix) == "Customer#*******42"
    )
    # strings without a full-width digit run pass through untouched
    assert _one(spark, "no digits here", mask_id_suffix) == "no digits here"


def test_pseudonymize_joinable_and_salted(spark):
    df = spark.createDataFrame([(7,), (8,)], "k INT")
    a = df.select(pseudonymize(F.col("k"), "s1").alias("p")).collect()
    b = df.select(pseudonymize(F.col("k"), "s1").alias("p")).collect()
    c = df.select(pseudonymize(F.col("k"), "s2").alias("p")).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]  # deterministic
    assert {r["p"] for r in a} != {r["p"] for r in c}  # salt changes it
    assert all(len(r["p"]) == 64 for r in a)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


BENCH_DOC = "alpha beta gamma delta epsilon zeta eta theta"


def test_contamination_finds_planted_overlap(spark):
    corpus = _corpus(
        spark,
        [
            (1, "x y " + BENCH_DOC + " z w"),  # contains all benchmark 5-grams
            (2, "totally different words entirely here now forever and ever"),
        ],
    )
    bench = _corpus(spark, [(100, BENCH_DOC)])
    rows = {r["doc_id"]: r for r in contamination_report(corpus, bench, n=5).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_matched"] == 4  # the 4 distinct 5-grams of an 8-token doc
    assert rows[1]["contamination"] > 0


def test_decontaminate_drops_only_contaminated(spark):
    corpus = _corpus(
        spark,
        [
            (1, "x y " + BENCH_DOC + " z w"),
            (2, "totally different words entirely here now forever and ever"),
        ],
    )
    bench = _corpus(spark, [(100, BENCH_DOC)])
    kept = [r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()]
    assert kept == [2]


def test_decontaminate_catches_long_doc_rounding_to_zero(spark):
    # a document with >20k distinct n-grams and ONE benchmark hit has a
    # contamination ratio that ROUNDS to 0.0000 — the filter must use
    # the unrounded ratio and still drop it at max_contamination=0.0
    filler = " ".join(f"w{i}" for i in range(100000))
    long_doc = filler + " " + BENCH_DOC
    corpus = _corpus(spark, [(1, long_doc), (2, "clean words only here")])
    bench = _corpus(spark, [(100, BENCH_DOC)])
    report = {r["doc_id"]: r for r in contamination_report(corpus, bench, n=5).collect()}
    assert report[1]["contamination"] == 0.0  # rounded column really is 0
    kept = [r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()]
    assert kept == [2]


def test_contamination_short_docs_are_safe(spark):
    # docs shorter than n tokens produce empty n-gram arrays, not errors
    corpus = _corpus(spark, [(1, "too short")])
    bench = _corpus(spark, [(100, "also tiny")])
    assert contamination_report(corpus, bench, n=5).count() == 0


def test_redact_pii_is_idempotent(spark):
    texts = [
        "a@b.com then 10.0.0.255 then 555-123-9876",
        "no pii at all",
        "double aa@bb.org cc@dd.org and 192.168.1.1 1.2.3.4",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t STRING")
    once = df.select(redact_pii(F.col("t")).alias("r"))
    twice = once.select(redact_pii(F.col("r")).alias("r"))
    assert [r["r"] for r in once.collect()] == [r["r"] for r in twice.collect()]


def test_decontaminate_is_idempotent(spark):
    corpus = _corpus(
        spark,
        [
            (1, "x y " + BENCH_DOC + " z w"),
            (2, "totally different words entirely here now forever and ever"),
            (3, "more clean text that shares nothing with the benchmark docs"),
        ],
    )
    bench = _corpus(spark, [(100, BENCH_DOC)])
    once = decontaminate(corpus, bench, n=5)
    twice = decontaminate(once, bench, n=5)
    assert sorted(r["doc_id"] for r in once.collect()) == sorted(
        r["doc_id"] for r in twice.collect()
    )


def test_contamination_fraction_bounded(spark):
    corpus = _corpus(
        spark,
        [(i, f"prefix{i} " + BENCH_DOC + f" suffix{i}") for i in range(10)],
    )
    bench = _corpus(spark, [(100, BENCH_DOC)])
    for r in contamination_report(corpus, bench, n=5).collect():
        assert 0.0 < r["contamination"] <= 1.0
        assert r["n_matched"] <= r["n_ngrams"]


def test_k_anonymity_suppression_drops_only_small_groups(spark):
    from dog_data_pipeline_spark.operators.privacy import (
        k_anonymity_report,
        suppress_small_groups,
    )

    rows = [(i, "A", "X") for i in range(6)] + [(100, "B", "X"), (101, "B", "Y")]
    df = spark.createDataFrame(rows, "id LONG, nat STRING, seg STRING")
    rep = {
        (r["nat"], r["seg"]): (r["group_size"], r["violates_k"])
        for r in k_anonymity_report(df, ["nat", "seg"], k=3).collect()
    }
    assert rep[("A", "X")] == (6, False)
    assert rep[("B", "X")] == (1, True)
    assert rep[("B", "Y")] == (1, True)
    kept = {r["id"] for r in suppress_small_groups(df, ["nat", "seg"], k=3).collect()}
    assert kept == set(range(6))


def test_psi_zero_for_identical_and_positive_for_shift(spark):
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.operators.quality import psi_report

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_report(base, base, "v", bins=10).agg(F.sum("psi_term")).first()[0]
    assert abs(same) < 1e-12
    shifted = spark.range(1000).select(
        ((F.col("id") % 100) * 0.5 + 50.0).alias("v")  # mass squeezed into upper half
    )
    drift = psi_report(base, shifted, "v", bins=10).agg(F.sum("psi_term")).first()[0]
    assert drift > 0.25  # "drifted" by the standard PSI rubric


def test_contamination_spans_locates_planted_quote(spark):
    from dog_data_pipeline_spark.operators.contamination import (
        contamination_spans,
        scrub_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [
            (1, f"one two three {quote} four five six seven eight nine"),
            (2, "clean document with no overlap at all whatsoever here today"),
        ],
        ["doc_id", "text"],
    )
    spans = contamination_spans(corpus, bench, window_tokens=8).collect()
    assert len(spans) == 1
    s = spans[0]
    # the quote occupies token positions 4..11 of doc 1
    assert (s.id, s.span_start, s.span_end) == (1, 4, 11)

    scrubbed = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in scrub_contaminated_spans(corpus, bench, window_tokens=8).collect()
    }
    assert scrubbed[1] == (
        "one two three four five six seven eight nine",
        8,
    )
    assert scrubbed[2][1] == 0  # untouched doc passes through verbatim


def test_scrub_is_noop_without_overlap(spark):
    from dog_data_pipeline_spark.operators.contamination import (
        scrub_contaminated_spans,
    )

    bench = spark.createDataFrame(
        [(9, "totally disjoint benchmark content nothing shared here at all")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [(1, "some training text that shares not a single long run of tokens")],
        ["doc_id", "text"],
    )
    rows = scrub_contaminated_spans(corpus, bench, window_tokens=8).collect()
    assert rows[0].clean_text == rows[0].text
    assert rows[0].n_removed_tokens == 0


def test_pii_detection_report_counts_and_post_redaction_zero(spark):
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.operators.privacy import (
        pii_detection_report,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("g1", "write bob@x.com or 10.0.0.1", "call +1 (555) 123-4567 now"),
            ("g1", "nothing here", "ok"),
            ("g2", "a@b.co and c@d.io", "zip"),
        ],
        ["g", "t1", "t2"],
    )
    rep = {
        (r.g, r.column): r
        for r in pii_detection_report(df, ["t1", "t2"], group_col="g").collect()
    }
    assert rep[("g1", "t1")].email_rows == 1
    assert rep[("g1", "t1")].ipv4_rows == 1
    assert rep[("g1", "t2")].phone_hits == 1
    assert rep[("g2", "t1")].email_hits == 2
    assert rep[("g2", "t2")].email_hits == 0
    # multi-column grouping
    two = pii_detection_report(
        df.withColumn("stage", F.lit("raw")), ["t1"], group_col=["stage", "g"]
    ).collect()
    assert {(r.stage, r.g) for r in two} == {("raw", "g1"), ("raw", "g2")}
    # after redaction every counter is zero
    clean = df.select(
        "g", redact_pii(F.col("t1")).alias("t1"), redact_pii(F.col("t2")).alias("t2")
    )
    for r in pii_detection_report(clean, ["t1", "t2"]).collect():
        assert r.email_hits == r.phone_hits == r.ipv4_hits == 0


# ---------------------------------------------------------------------------
# semantic (embedding-level) contamination
# ---------------------------------------------------------------------------


def test_semantic_contamination_flags_near_and_spares_orthogonal(spark):
    from dog_data_pipeline_spark.operators.contamination import (
        semantic_contamination,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),   # benchmark item
        (1, [0.99, 0.14, 0.0]), # near-duplicate of 0 -> contaminated
        (2, [0.0, 1.0, 0.0]),   # orthogonal -> clean
        (3, [-1.0, 0.0, 0.0]),  # anti-parallel -> clean (cos = -1)
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    bench = df.filter(F.col("vec_id") == 0)
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(df, bench, threshold=0.9).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["n_contaminating"] == 1
    assert not out[2]["is_contaminated"] and out[2]["n_contaminating"] == 0
    assert not out[3]["is_contaminated"]
    assert out[3]["max_benchmark_cos"] == -1.0
    # benchmark member itself: self-match excluded, no other bench rows
    assert not out[0]["is_contaminated"]


def test_semantic_contamination_counts_multiple_benchmark_hits(spark):
    from dog_data_pipeline_spark.operators.contamination import (
        semantic_contamination,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.96, 0.28]),
        (10, [1.0, 0.01]),  # corpus row close to BOTH benchmark rows
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    bench = df.filter(F.col("vec_id") < 2)
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(df, bench, threshold=0.9).collect()
    }
    assert out[10]["n_contaminating"] == 2
    # rounded-before-threshold contract: max_benchmark_cos is 4-decimal
    assert abs(out[10]["max_benchmark_cos"] * 1e4 - round(out[10]["max_benchmark_cos"] * 1e4)) < 1e-6


def test_semantic_contamination_zero_norm_vector_is_clean_not_crash(spark):
    from dog_data_pipeline_spark.operators.contamination import (
        semantic_contamination,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 0.0]),  # failed/padded encode -> zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    bench = df.filter(F.col("vec_id") == 0)
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(df, bench, threshold=0.5).collect()
    }
    assert not out[1]["is_contaminated"]
    assert out[1]["n_contaminating"] == 0
    assert out[1]["max_benchmark_cos"] is None


def test_semantic_contamination_distinct_datasets_sharing_id_space(spark):
    """Round-5 regression (ADVICE): corpus and benchmark are DISTINCT
    datasets that both use 0-based ids. Bare-id masking would null the
    real corpus[0] vs benchmark[0] pair and under-report; the mask must
    only fire for the same RECORD (id AND vector equal)."""
    from dog_data_pipeline_spark.operators.contamination import (
        semantic_contamination,
    )

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    bench = spark.createDataFrame(
        [(0, [0.99, 0.14, 0.0])],  # id collides with corpus 0; different vector
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    # corpus 0 IS near benchmark 0 despite the id collision
    assert out[0]["is_contaminated"] and out[0]["n_contaminating"] == 1
    assert not out[1]["is_contaminated"]
    # true self-match (same id AND same vector) still masked
    subset_bench = corpus.filter(F.col("vec_id") == 0)
    out2 = {
        r["vec_id"]: r
        for r in semantic_contamination(
            corpus, subset_bench, threshold=0.9
        ).collect()
    }
    assert not out2[0]["is_contaminated"]
    assert out2[0]["max_benchmark_cos"] is None


def test_laplace_noise_is_keyed_and_distributed_right(spark):
    """Inverse-CDF Laplace: deterministic per (key, salt), re-salted
    draws differ, and over many keys the empirical mean-|noise|
    approaches the scale b (E|Laplace(b)| = b)."""
    from dog_data_pipeline_spark.operators.privacy import laplace_noise

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    out = df.select(
        "k",
        laplace_noise(F.col("k"), 2.0, "s1").alias("n1"),
        laplace_noise(F.col("k"), 2.0, "s1").alias("n1b"),
        laplace_noise(F.col("k"), 2.0, "s2").alias("n2"),
    ).collect()
    assert all(r["n1"] == r["n1b"] for r in out)
    assert any(r["n1"] != r["n2"] for r in out)
    mean_abs = sum(abs(r["n1"]) for r in out) / len(out)
    assert 1.6 < mean_abs < 2.4
    signs = sum(1 for r in out if r["n1"] > 0)
    assert 800 < signs < 1200


def test_dp_release_counts_hides_exact_counts_deterministically(spark):
    from dog_data_pipeline_spark.operators.privacy import dp_release_counts

    rows = [(i, f"g{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "id INT, g STRING")
    a = {r["g"]: r["noisy_count"] for r in dp_release_counts(df, ["g"], 1.0).collect()}
    b = {
        r["g"]: r["noisy_count"]
        for r in dp_release_counts(df.repartition(7), ["g"], 1.0).collect()
    }
    assert a == b
    # noise is bounded in practice: ln(2^-32) scale max ~22 nats
    assert all(abs(v - 30.0) < 25 for v in a.values())
    # true count never appears in the schema
    assert set(dp_release_counts(df, ["g"]).columns) == {"g", "noisy_count"}


def test_dp_release_sums_clips_outlier_influence(spark):
    from dog_data_pipeline_spark.operators.privacy import dp_release_sums

    base = [(i, "g", 1.0) for i in range(50)]
    big = base + [(99, "g", 1e9)]
    df_a = spark.createDataFrame(base, "id INT, g STRING, v DOUBLE")
    df_b = spark.createDataFrame(big, "id INT, g STRING, v DOUBLE")
    sa = dp_release_sums(df_a, ["g"], "v", clip=2.0, epsilon=1.0).collect()[0]
    sb = dp_release_sums(df_b, ["g"], "v", clip=2.0, epsilon=1.0).collect()[0]
    # the outlier contributes at most `clip`, not 1e9
    assert abs(sb["noisy_sum"] - sa["noisy_sum"]) <= 2.0 + 1e-9

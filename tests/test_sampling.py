"""Deterministic sampling/split: partition-invariance, cross-engine
agreement with DuckDB, split totality/stability, fraction accuracy."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dog_data_pipeline_spark.operators.sampling import (
    deterministic_sample,
    split_sql_case,
    with_split,
)
from dog_data_pipeline_spark.tables import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_DIR, "documents")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_sample_is_partition_invariant(spark, docs):
    a = _ids(deterministic_sample(docs.repartition(1), "doc_id", 0.3, salt="s"))
    b = _ids(deterministic_sample(docs.repartition(7), "doc_id", 0.3, salt="s"))
    assert a == b and 0 < len(a) < docs.count()


def test_sample_matches_duckdb_row_for_row(docs):
    got = _ids(deterministic_sample(docs, "doc_id", 0.3, salt="s"))
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':s'), 1, 8)
                  < '{format(int(0.3 * 16**8), "08x")}'
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_sample_fraction_concentrates(docs):
    n = docs.count()
    k = deterministic_sample(docs, "doc_id", 0.5, salt="x").count()
    assert abs(k / n - 0.5) < 0.1  # 500 docs -> ~±0.07 at 3 sigma


def test_different_salts_draw_different_samples(docs):
    a = set(_ids(deterministic_sample(docs, "doc_id", 0.3, salt="a")))
    b = set(_ids(deterministic_sample(docs, "doc_id", 0.3, salt="b")))
    assert a != b


def test_split_total_disjoint_and_stable_under_appends(spark, docs):
    full = with_split(docs, "doc_id", salt="s")
    counts = {r["split"]: r["n"] for r in full.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    # assignment of existing rows is unchanged when computed on a subset
    # (late-arriving data cannot migrate rows between splits)
    subset = with_split(docs.filter(F.col("doc_id") < 100), "doc_id", salt="s")
    sub_map = {r["doc_id"]: r["split"] for r in subset.collect()}
    full_map = {r["doc_id"]: r["split"] for r in full.filter(F.col("doc_id") < 100).collect()}
    assert sub_map == full_map


def test_split_sql_case_matches_spark_assignment(docs):
    spark_map = {
        r["doc_id"]: r["split"] for r in with_split(docs, "doc_id", salt="s").collect()
    }
    con = duckdb.connect()
    sql_map = dict(
        con.execute(
            f"SELECT doc_id, {split_sql_case('doc_id', salt='s')} "
            f"FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    assert spark_map == sql_map


def test_weight_validation():
    import pandas  # noqa: F401  (spark-free arg validation)

    with pytest.raises(ValueError, match="sum to 1"):
        split_sql_case("k", weights=[("a", 0.5), ("b", 0.3)])
    with pytest.raises(ValueError, match="fraction"):
        from dog_data_pipeline_spark.operators.sampling import _threshold_hex

        _threshold_hex(1.5)


def test_stratified_sample_matches_duckdb_and_hits_mix(docs):
    from dog_data_pipeline_spark.operators.sampling import stratified_sample

    got = _ids(
        stratified_sample(
            docs, "doc_id", "lang", {"en": 0.2, "zh": 0.8}, salt="mix", default=0.5
        )
    )
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) <
                  CASE WHEN lang = 'en' THEN '33333333'
                       WHEN lang = 'zh' THEN 'cccccccc'
                       ELSE '80000000' END
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_token_budget_sample_respects_budget_and_keeps_small_strata(spark):
    from dog_data_pipeline_spark.operators.sampling import token_budget_sample
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 400 else "small", 10) for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_toks INT")
    kept = token_budget_sample(df, "doc_id", "source", "n_toks", 1000.0)
    sums = {
        r["source"]: r["s"]
        for r in kept.groupBy("source").agg(F.sum("n_toks").alias("s")).collect()
    }
    # 'small' stratum (400 tokens) is under budget: kept in full
    assert sums["small"] == 400
    # 'big' stratum (4000 tokens) lands near the 1000-token budget
    assert 600 <= sums["big"] <= 1400


def test_token_budget_sample_is_deterministic(spark):
    from dog_data_pipeline_spark.operators.sampling import token_budget_sample

    rows = [(i, f"s{i % 3}", 5 + i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_toks INT")
    a = {r["doc_id"] for r in token_budget_sample(df, "doc_id", "source", "n_toks", 200.0).collect()}
    b = {r["doc_id"] for r in token_budget_sample(df.repartition(13), "doc_id", "source", "n_toks", 200.0).collect()}
    assert a == b and len(a) > 0


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from dog_data_pipeline_spark.operators.dedup import jaccard_pairs
    from dog_data_pipeline_spark.operators.sampling import leakage_safe_split
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # plant near-identical copies under shifted ids
    dup = docs.limit(20).select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    corpus = docs.unionByName(dup)
    pairs = jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)
    assert pairs.count() >= 20
    out = leakage_safe_split(corpus, pairs, "doc_id")
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    # every planted pair shares a split
    for r in pairs.collect():
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])
    # and non-duplicated docs keep the plain with_split assignment
    from dog_data_pipeline_spark.operators.sampling import with_split

    plain = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id").collect()
    }
    dup_ids = {r["id_a"] for r in pairs.collect()} | {
        r["id_b"] for r in pairs.collect()
    }
    for d, s in split_of.items():
        if d not in dup_ids:
            assert s == plain.get(d, s)


def test_mixture_upsample_integral_epochs_exact(spark):
    from dog_data_pipeline_spark.operators.sampling import mixture_upsample

    # A: 10 docs x 10 tokens (mass 100, w=10); B: 10 docs x 40 tokens
    # (mass 400, w=20). budget=600 -> alloc A=200 (epochs 2.0),
    # B=400 (epochs 1.0): integral, so no fractional hash dependence.
    rows = [(i, "A", 10) for i in range(10)] + [(100 + i, "B", 40) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_toks INT")
    out = mixture_upsample(df, "doc_id", "source", "n_toks", budget_tokens=600.0)
    got = [(r["doc_id"], r["epoch"]) for r in out.collect()]
    a = sorted(t for t in got if t[0] < 100)
    b = sorted(t for t in got if t[0] >= 100)
    assert a == sorted([(i, e) for i in range(10) for e in (0, 1)])
    assert b == [(100 + i, 0) for i in range(10)]


def test_mixture_upsample_fractional_topup_bounded_and_stable(spark):
    from dog_data_pipeline_spark.operators.sampling import mixture_upsample

    rows = [(i, "A", 10) for i in range(10)] + [(100 + i, "B", 40) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, n_toks INT")
    # budget=900 -> A epochs 3.0 (exact), B epochs 1.5: every B doc gets
    # 1 or 2 copies, chosen by md5 — deterministic across runs
    out1 = {(r["doc_id"], r["epoch"]) for r in
            mixture_upsample(df, "doc_id", "source", "n_toks",
                             budget_tokens=900.0, salt="s").collect()}
    out2 = {(r["doc_id"], r["epoch"]) for r in
            mixture_upsample(df, "doc_id", "source", "n_toks",
                             budget_tokens=900.0, salt="s").collect()}
    assert out1 == out2
    b_copies = {}
    for d, e in out1:
        if d >= 100:
            b_copies.setdefault(d, []).append(e)
    assert set(b_copies) == {100 + i for i in range(10)}  # every doc >= 1 copy
    for eps in b_copies.values():
        assert sorted(eps) in ([0], [0, 1])  # dense epoch indices


def test_weighted_priority_sample_rejects_nonpositive_weights(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from dog_data_pipeline_spark.operators.sampling import weighted_priority_sample

    df = spark.createDataFrame(
        [("a", 10.0), ("b", 0.0), ("c", 5.0)], "k STRING, w DOUBLE"
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)) as ei:
        weighted_priority_sample(df, "k", "w", k=2).collect()
    assert "non-positive/NULL" in str(ei.value)


def test_split_leakage_report_counts_and_safe_zero(spark):
    from dog_data_pipeline_spark.operators.sampling import (
        split_leakage_report,
        with_split,
    )

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    # dup pairs: each even doc paired with doc+1
    pairs = (
        spark.range(0, 200, 2)
        .selectExpr("id AS id_a", "id + 1 AS id_b")
    )
    rep = split_leakage_report(docs, pairs, "doc_id", salt="t").collect()[0]
    assert rep["n_dup_pairs"] == 100
    # replay the naive split to confirm the leak count independently
    s = {
        r["doc_id"]: r["split"]
        for r in with_split(docs, "doc_id", salt="t").collect()
    }
    expected = sum(1 for a in range(0, 200, 2) if s[a] != s[a + 1])
    assert rep["plain_leaked_pairs"] == expected > 0
    assert abs(rep["plain_leak_rate"] - round(expected / 100, 4)) < 1e-9
    assert rep["safe_split_zero_leaks"] is True


def test_split_leakage_report_clean_corpus_reports_zero_not_nulls(spark):
    from dog_data_pipeline_spark.operators.sampling import split_leakage_report

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    empty = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    rep = split_leakage_report(docs, empty, "doc_id", salt="t").collect()[0]
    assert rep["n_dup_pairs"] == 0
    assert rep["plain_leaked_pairs"] == 0
    assert rep["plain_leak_rate"] is None
    assert rep["safe_split_zero_leaks"] is True


def test_quality_quota_keeps_best_k_per_source(spark):
    """Per-source quota selects by score (desc) with doc_id tie-break,
    deterministically across partitionings."""
    from dog_data_pipeline_spark.operators.sampling import quality_quota_sample

    rows = [
        (i, "s%d" % (i % 2), float(i % 7)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, source STRING, score DOUBLE")
    out = quality_quota_sample(df, "doc_id", "source", "score", cap=3)
    kept = out.filter("kept").orderBy("source", "doc_id").collect()
    assert len(kept) == 6
    for src in ("s0", "s1"):
        ks = [r for r in kept if r["source"] == src]
        # reference ranking: (score desc, doc_id asc), take 3
        expected = sorted(
            [(-(r[2]), r[0]) for r in rows if r[1] == src]
        )[:3]
        assert sorted(r["doc_id"] for r in ks) == sorted(d for _, d in expected)
    # partition-invariance
    out2 = quality_quota_sample(
        df.repartition(13), "doc_id", "source", "score", cap=3
    )
    assert sorted(
        (r["doc_id"],) for r in out2.filter("kept").collect()
    ) == sorted((r["doc_id"],) for r in kept)


def test_dsir_log_weights_favor_target_distribution(spark):
    """Planted construction: target docs are all 'alpha beta' grams,
    off-target all 'gamma delta'. A fresh doc written in target-speak
    must outscore one written in raw-only-speak."""
    from dog_data_pipeline_spark.operators.sampling import dsir_log_weights

    rows = (
        [(i, "alpha beta alpha beta", True) for i in range(10)]
        + [(100 + i, "gamma delta gamma delta", False) for i in range(10)]
        + [(900, "alpha beta alpha beta", False),   # target-speak probe
           (901, "gamma delta gamma delta", False)] # raw-speak probe
    )
    df = spark.createDataFrame(rows, "doc_id INT, text STRING, is_target BOOLEAN")
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(df, "doc_id", "text", "is_target").collect()
    }
    assert got[900]["log_w"] > got[901]["log_w"]
    # identical text => identical weight regardless of the target flag
    assert got[900]["log_w"] == got[0]["log_w"]
    # gram accounting: 4 unigrams + 3 bigrams
    assert got[900]["n_grams"] == 7


def test_dsir_resample_is_deterministic_and_weight_dominated(spark):
    from dog_data_pipeline_spark.operators.sampling import dsir_resample

    rows = [(i, 50.0 if i < 5 else -50.0) for i in range(100)]
    scored = spark.createDataFrame(rows, "doc_id INT, log_w DOUBLE")
    kept = sorted(
        r["doc_id"] for r in dsir_resample(scored, "doc_id", k=5).collect()
    )
    # 100 nats of separation swamps the ln(u) noise band (~22 nats)
    assert kept == [0, 1, 2, 3, 4]
    kept2 = sorted(
        r["doc_id"]
        for r in dsir_resample(scored.repartition(7), "doc_id", k=5).collect()
    )
    assert kept2 == kept

"""Unit coverage for the perceptual image dHash, TF-IDF cosine join,
and weighted priority (sequential Poisson) sampling operators."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from dog_data_pipeline_spark.multimodal.image import (
    dhash_images,
    make_fake_image,
    pool_resize,
)
from dog_data_pipeline_spark.operators.dedup import simhash_pairs_pigeonhole
from dog_data_pipeline_spark.operators.sampling import weighted_priority_sample
from dog_data_pipeline_spark.operators.search import tfidf_cosine_pairs


def _ref_dhash(px: np.ndarray, factor: int = 4) -> int:
    g = pool_resize(px, factor)[:8, :8].astype(int)
    val = 0
    for y in range(8):
        for x in range(7):
            if g[y, x + 1] > g[y, x]:
                val |= 1 << (y * 7 + x)
    return val


def _grad_image(seed: int) -> np.ndarray:
    y, x = np.mgrid[0:32, 0:32]
    return ((seed * 37 + y * 5 + x * 11) % 256).astype(np.uint8)


def test_dhash_matches_reference_loop(spark):
    imgs = [(k, make_fake_image(32, 32, _grad_image(k))) for k in range(4)]
    df = spark.createDataFrame(imgs, "image_id LONG, content BINARY")
    got = {r["image_id"]: r["dhash"] for r in dhash_images(df, factor=4).collect()}
    for k in range(4):
        assert got[k] == _ref_dhash(_grad_image(k))
        assert 0 <= got[k] < 1 << 56  # 56-bit: sign-safe in int64


def test_dhash_identical_images_zero_hamming_pair(spark):
    # two identical + one unrelated image: the pigeonhole pair join must
    # return exactly the identical pair at hamming 0
    base = _grad_image(1)
    noisy = ((np.arange(32 * 32).reshape(32, 32) * 97 + 13) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, make_fake_image(32, 32, base)),
         (1, make_fake_image(32, 32, base)),
         (2, make_fake_image(32, 32, noisy))],
        "image_id LONG, content BINARY",
    )
    sig = dhash_images(df).select(
        F.col("image_id").alias("id"), F.col("dhash").alias("simhash")
    )
    pairs = simhash_pairs_pigeonhole(df, "image_id", sig=sig, max_hamming=3).collect()
    exact = [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs]
    assert (0, 1, 0) in exact
    for a, b, h in exact:
        assert h <= 3


def test_dhash_respects_id_column_type(spark):
    # string ids must survive the schema derivation (no hardcoded LONG)
    df = spark.createDataFrame(
        [("x", make_fake_image(32, 32, _grad_image(0)))],
        "image_id STRING, content BINARY",
    )
    row = dhash_images(df).collect()[0]
    assert row["image_id"] == "x"


def test_tfidf_cosine_pairs_exact_small(spark):
    # doc 1 and 2 share all bigrams; doc 3 shares none
    docs = spark.createDataFrame(
        [(1, "red fox jumps"), (2, "red fox jumps"), (3, "blue whale sings deep")],
        "doc_id LONG, text STRING",
    )
    rows = tfidf_cosine_pairs(docs, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["cosine"] == 1.0


def test_tfidf_max_df_drops_hot_terms(spark):
    # 'a b' appears in every doc -> with max_df=2 it is cut, leaving
    # docs 1/2 similar only through 'b c'
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b x")], "doc_id LONG, text STRING"
    )
    with_cap = tfidf_cosine_pairs(docs, threshold=0.01, max_df=2).collect()
    # 'a b' (df=3) is dropped; 'b c' (df=2) kept with idf ln(3/2)>0
    assert [(r["id_a"], r["id_b"], r["cosine"]) for r in with_cap] == [(1, 2, 1.0)]


def test_weighted_priority_sample_matches_reference(spark):
    import hashlib

    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    df = spark.createDataFrame(rows, "k LONG, w DOUBLE")
    got = [r["k"] for r in weighted_priority_sample(df, "k", "w", k=10, salt="s")
           .select("k").collect()]

    def pri(i: int, w: float) -> float:
        h = hashlib.md5(f"{i}:s".encode()).hexdigest()[:8]
        return (int(h, 16) + 0.5) / 16**8 / w

    expect = sorted(rows, key=lambda t: (pri(*t), t[0]))[:10]
    assert got == [k for k, _ in expect]


def test_weighted_priority_sample_prefers_heavy_rows(spark):
    # one row weighted 10_000x heavier than 500 others is selected with
    # near-certainty under PPS; its priority is ~1e-4 of a typical one
    rows = [(i, 1.0) for i in range(500)] + [(999, 10000.0)]
    df = spark.createDataFrame(rows, "k LONG, w DOUBLE")
    got = {r["k"] for r in weighted_priority_sample(df, "k", "w", k=25).collect()}
    assert 999 in got
    assert len(got) == 25


def test_weighted_priority_sample_priority_formula(spark):
    df = spark.createDataFrame([(7, 2.0)], "k LONG, w DOUBLE")
    row = weighted_priority_sample(df, "k", "w", k=1, salt="z").collect()[0]
    import hashlib

    h = hashlib.md5(b"7:z").hexdigest()[:8]
    assert math.isclose(
        row["priority"], (int(h, 16) + 0.5) / 16**8 / 2.0, rel_tol=0, abs_tol=0
    )


def test_compaction_plan_matches_sequential_reference(spark):
    from dog_data_pipeline_spark.sources.compaction import (
        compaction_plan,
        compaction_summary,
    )

    rows = [(g, i, 10 + (i * 37) % 90) for g in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "grp STRING, fid LONG, bytes LONG")
    plan = compaction_plan(
        df, "bytes", target_bytes=200, group_cols=["grp"], order_cols=["fid"]
    )
    got = {
        (r["grp"], r["fid"]): r["bin"]
        for r in plan.select("grp", "fid", "bin").collect()
    }
    # sequential reference: first-fit in fid order per group
    for g in ("a", "b"):
        cum = 0
        for i in range(50):
            size = 10 + (i * 37) % 90
            assert got[(g, i)] == cum // 200, (g, i)
            cum += size
    # bins approach the target: every non-final bin ends because its
    # cumulative size crossed the target
    summ = compaction_summary(plan, "bytes", ["grp"]).collect()
    per_grp = {}
    for r in summ:
        per_grp.setdefault(r["grp"], []).append((r["bin"], r["bin_bytes"]))
    for g, bins in per_grp.items():
        bins.sort()
        for b, size in bins[:-1]:
            assert size >= 200 - 99  # within one max-file of target


def test_compaction_plan_rejects_bad_target(spark):
    import pytest as _pytest

    from dog_data_pipeline_spark.sources.compaction import compaction_plan

    df = spark.createDataFrame([("a", 1, 5)], "grp STRING, fid LONG, bytes LONG")
    with _pytest.raises(ValueError):
        compaction_plan(df, "bytes", 0, ["grp"], ["fid"])


def test_approx_quantiles_certified_bounds_hold_with_ties(spark):
    from dog_data_pipeline_spark.operators.aggregates import (
        approx_quantiles_certified,
    )

    # low-cardinality column: a single value spans thousands of ranks —
    # the rank-RANGE intersection must still certify
    df = spark.createDataFrame(
        [(float(i % 5), float(i)) for i in range(5000)], "ties DOUBLE, uniq DOUBLE"
    )
    out = approx_quantiles_certified(
        df, ["ties", "uniq"], [0.1, 0.5, 0.9], accuracy=1000
    ).collect()
    assert len(out) == 6
    assert all(r["rank_bound_ok"] for r in out)


def test_audio_fingerprint_matches_reference_and_pairs(spark):
    from dog_data_pipeline_spark.multimodal.audio import (
        fingerprint_audio,
        make_fake_audio,
    )

    def wave(seed: int) -> np.ndarray:
        i = np.arange(57 * 32)
        return (seed * 13 + i * 7) % 200 - 100

    clips = spark.createDataFrame(
        [(k, make_fake_audio(1000, wave(k))) for k in range(3)],
        "audio_id LONG, content BINARY",
    )
    got = {r["audio_id"]: r["afp"] for r in fingerprint_audio(clips).collect()}

    def ref_fp(x: np.ndarray) -> int:
        e = (x[: 57 * 32].astype(np.int64) ** 2).reshape(57, 32).sum(axis=1)
        val = 0
        for f in range(56):
            if e[f + 1] > e[f]:
                val |= 1 << f
        return val

    for k in range(3):
        assert got[k] == ref_fp(wave(k))
        assert 0 <= got[k] < 1 << 56


def test_audio_fingerprint_rejects_short_clip(spark):
    import pytest as _pytest

    from dog_data_pipeline_spark.multimodal.audio import (
        fingerprint_audio,
        make_fake_audio,
    )

    clips = spark.createDataFrame(
        [(0, make_fake_audio(1000, np.zeros(100, dtype=np.int16)))],
        "audio_id LONG, content BINARY",
    )
    with _pytest.raises(Exception, match="too short"):
        fingerprint_audio(clips).collect()


def test_incremental_merge_equals_full_recompute(spark):
    from dog_data_pipeline_spark.operators.incremental import (
        aggregate_partials,
        merge_aggregate_state,
        read_state,
    )

    rows = [(i, "s" + str(i % 3), (i * 17) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id LONG, src STRING, v LONG")
    full = read_state(aggregate_partials(df, ["src"], "v"), ["src"]).collect()
    state = aggregate_partials(df.filter("id % 5 != 0"), ["src"], "v")
    # fold in two batches, one of which introduces no new keys
    for pred in ("id % 5 = 0 AND id < 100", "id % 5 = 0 AND id >= 100"):
        state = merge_aggregate_state(
            state, aggregate_partials(df.filter(pred), ["src"], "v"), ["src"]
        )
    merged = read_state(state, ["src"]).collect()
    key = lambda r: r["src"]  # noqa: E731
    assert sorted(map(tuple, merged), key=lambda t: t[0]) == sorted(
        map(tuple, full), key=lambda t: t[0]
    )


def test_incremental_merge_new_key_passes_through(spark):
    from dog_data_pipeline_spark.operators.incremental import (
        aggregate_partials,
        merge_aggregate_state,
        read_state,
    )

    old = spark.createDataFrame([("a", 5), ("a", 7)], "src STRING, v LONG")
    new = spark.createDataFrame([("b", 3)], "src STRING, v LONG")
    state = merge_aggregate_state(
        aggregate_partials(old, ["src"], "v"),
        aggregate_partials(new, ["src"], "v"),
        ["src"],
    )
    got = {r["src"]: (r["n_rows"], r["total"], r["min_val"], r["max_val"])
           for r in read_state(state, ["src"]).collect()}
    assert got == {"a": (2, 12, 5, 7), "b": (1, 3, 3, 3)}


# ---------------------------------------------------------------------------
# mergeable HLL distinct-count state (holistic companion to the partials)
# ---------------------------------------------------------------------------


def test_hll_distinct_small_cardinality_is_exact(spark):
    """Datasketches HLL stays in exact sparse mode at small
    cardinalities — estimates must equal exact distinct counts."""
    from dog_data_pipeline_spark.operators.incremental import (
        distinct_partials,
        read_distinct_state,
    )

    rows = [(k % 3, k % 50) for k in range(1000)]
    df = spark.createDataFrame(rows, "g INT, v INT")
    out = {
        r["g"]: r["distinct_est"]
        for r in read_distinct_state(
            distinct_partials(df, ["g"], "v"), ["g"]
        ).collect()
    }
    # g=0 sees v in {0,3,6,...,48} etc. — exact distinct per group:
    import numpy as np

    for g in range(3):
        exact = len({k % 50 for k in range(1000) if k % 3 == g})
        assert out[g] == exact


def test_hll_merge_of_batches_matches_overlap_semantics(spark):
    """Merging two batch sketches estimates the distinct of the UNION
    (overlapping keys counted once), and within documented error of
    exact at above-sparse cardinality."""
    from dog_data_pipeline_spark.operators.incremental import (
        distinct_partials,
        merge_distinct_state,
        read_distinct_state,
    )

    # batch A: 0..5999, batch B: 3000..8999 -> union 9000 distinct
    a = spark.range(0, 6000).selectExpr("1 AS g", "id AS v")
    b = spark.range(3000, 9000).selectExpr("1 AS g", "id AS v")
    pa = distinct_partials(a, ["g"], "v")
    pb = distinct_partials(b, ["g"], "v")
    est = read_distinct_state(merge_distinct_state(pa, pb, ["g"]), ["g"]).collect()[
        0
    ]["distinct_est"]
    assert abs(est - 9000) <= 9000 * 0.05


def test_hll_merge_new_key_passes_through(spark):
    from dog_data_pipeline_spark.operators.incremental import (
        distinct_partials,
        merge_distinct_state,
        read_distinct_state,
    )

    a = spark.createDataFrame([(1, 10), (1, 11)], "g INT, v INT")
    b = spark.createDataFrame([(2, 10)], "g INT, v INT")
    out = {
        r["g"]: r["distinct_est"]
        for r in read_distinct_state(
            merge_distinct_state(
                distinct_partials(a, ["g"], "v"),
                distinct_partials(b, ["g"], "v"),
                ["g"],
            ),
            ["g"],
        ).collect()
    }
    assert out == {1: 2, 2: 1}

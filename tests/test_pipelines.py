"""Pipeline e2e tests on reference-shaped fixtures (FIXTURES.md B1-B7),
with hand-computed expected outputs covering the reference's edge
semantics: +1-frame segment overlap, trailing-segment drop, strict
frequency threshold, completeness, int+10 pad, extent-preserving clamp.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from dog_data_pipeline_spark.functions.geometry import recenter_clamp
from tests.conftest import SF_DIR
from dog_data_pipeline_spark.pipelines.merge_raw import merge_to_raw
from dog_data_pipeline_spark.pipelines.preprocess import (
    a2d_manifest,
    derive_action_manifest,
)
from dog_data_pipeline_spark.pipelines.tracking import (
    segment_frames,
    select_complete_dog_tracks,
    track_samples_pipeline,
    transform_tracks_max_extent,
)

DET_SCHEMA = "video_id STRING, frame_idx INT, subject_id INT, bbox ARRAY<DOUBLE>, cls INT"
META_SCHEMA = (
    "video_id STRING, frame_count INT, frame_height INT, frame_width INT, video_fps INT"
)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    # fps=2, seg_len=2s -> n=4 frames/segment; 13 frames -> segments
    # s0=[0,5) s1=[4,9) s2=[8,13); s3 (start 12) is trailing-short -> dropped
    rows = []
    for f in range(13):
        rows.append(("v1", f, 1, [10.0, 10.0, 30.0, 40.0] if f != 2 else [8.0, 12.0, 40.0, 50.0], 16))
        if f != 6:  # sub 2 misses frame 6 -> incomplete in s1 only
            rows.append(("v1", f, 2, [90.0, 60.0, 98.0, 76.0], 16))
        rows.append(("v1", f, 3, [0.0, 0.0, 5.0, 5.0], 16 if f == 0 else 0))
    # v2: only a low-frequency subject -> every segment dead-letters
    for f in range(9):
        rows.append(("v2", f, 7, [1.0, 1.0, 2.0, 2.0], 0))
    detections = spark.createDataFrame(rows, DET_SCHEMA)
    metadata = spark.createDataFrame(
        [("v1", 13, 80, 100, 2), ("v2", 9, 50, 50, 2)], META_SCHEMA
    )
    catalog = spark.createDataFrame(
        [("v1", "drive", "walk"), ("v2", "drive", "eat")],
        "video_id STRING, dataset STRING, action STRING",
    )
    return detections, metadata, catalog


def test_segment_frames_overlap_and_trailing_drop(spark, fixture_dfs):
    detections, metadata, _ = fixture_dfs
    seg = segment_frames(detections, metadata, segment_length_sec=2)
    v1 = seg.filter((F.col("video_id") == "v1") & (F.col("subject_id") == 1))
    by_seg = {
        r["segment_id"]: sorted(x["frame_idx"] for x in rows)
        for r, rows in [
            (r, v1.filter(F.col("segment_id") == r["segment_id"]).collect())
            for r in v1.select("segment_id").distinct().collect()
        ]
    }
    assert by_seg == {
        0: [0, 1, 2, 3, 4],   # +1 overlap: frame 4 in s0 AND s1
        1: [4, 5, 6, 7, 8],
        2: [8, 9, 10, 11, 12],
    }  # no s3: trailing short segment dropped


def test_select_complete_dog_tracks(spark, fixture_dfs):
    detections, metadata, _ = fixture_dfs
    seg = segment_frames(detections, metadata, 2)
    sel = select_complete_dog_tracks(seg, label=16, threshold=0.3)
    got = {
        (r["video_id"], r["segment_id"], r["subject_id"]) for r in sel.collect()
    }
    assert got == {
        ("v1", 0, 1), ("v1", 1, 1), ("v1", 2, 1),  # sub1 complete everywhere
        ("v1", 0, 2), ("v1", 2, 2),                # sub2 incomplete in s1
        # sub3 freq 1/5=0.2 not > 0.3; v2 sub7 freq 0
    }


def test_transform_max_extent_clamp(spark, fixture_dfs):
    detections, metadata, _ = fixture_dfs
    seg = segment_frames(detections, metadata, 2)
    sel = select_complete_dog_tracks(seg, 16, 0.3)
    out = transform_tracks_max_extent(seg, sel)
    # sub1 in s0: max_w=int(32)+10=42, max_h=int(38)+10=48
    r = out.filter(
        (F.col("segment_id") == 0) & (F.col("subject_id") == 1) & (F.col("frame_idx") == 0)
    ).collect()[0]
    assert (r["pad_w"], r["pad_h"]) == (42, 48)
    assert r["new_bbox"] == [0, 1, 42, 49]  # left clamp preserves extent
    # sub2: right/bottom clamp pulls box back inside 100x80
    r2 = out.filter(
        (F.col("segment_id") == 0) & (F.col("subject_id") == 2) & (F.col("frame_idx") == 0)
    ).collect()[0]
    assert (r2["pad_w"], r2["pad_h"]) == (18, 26)
    assert r2["new_bbox"] == [82, 54, 100, 80]


def test_track_samples_pipeline_ledgers(spark, fixture_dfs):
    detections, metadata, catalog = fixture_dfs
    samples, errors = track_samples_pipeline(detections, metadata, catalog)
    got = sorted(r["file_path"] for r in samples.collect())
    assert got == [
        "v1_000_001.mp4", "v1_000_002.mp4", "v1_001_001.mp4",
        "v1_002_001.mp4", "v1_002_002.mp4",
    ]
    s = samples.filter(F.col("file_path") == "v1_002_002.mp4").collect()[0]
    assert (s["original_file"], s["segment"], s["dataset"], s["action"]) == (
        "v1", "002", "drive", "walk",
    )
    errs = sorted((r["original_file"], r["segment"]) for r in errors.collect())
    assert errs == [("v2", "000"), ("v2", "001")]  # every v2 segment dead-letters
    assert errors.collect()[0]["error"] == "no qualifying subjects"


def _ref_recenter_clamp(bbox, w, h, mw, mh):
    """Independent test oracle for the published clamp semantics."""
    mw, mh = int(mw), int(mh)
    cx, cy = (bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2
    x1, y1 = math.ceil(cx - w / 2), math.ceil(cy - h / 2)
    x2, y2 = math.ceil(cx + w / 2), math.ceil(cy + h / 2)
    if x1 < 0:
        x1, x2 = 0, w
    if y1 < 0:
        y1, y2 = 0, h
    if x2 > mw:
        x2, x1 = mw, mw - w
    if y2 > mh:
        y2, y1 = mh, mh - h
    return [x1, y1, x2, y2]


def test_recenter_clamp_matches_oracle_grid(spark):
    cases = []
    for cx in [2.0, 25.5, 49.0, 98.0]:
        for cy in [1.0, 30.25, 77.5]:
            for w, h in [(10, 12), (30, 30), (120, 90)]:  # incl. larger-than-frame
                cases.append(([cx - 5, cy - 4, cx + 5, cy + 4], w, h))
    df = spark.createDataFrame(
        [(i, c[0], c[1], c[2]) for i, c in enumerate(cases)],
        "i INT, bbox ARRAY<DOUBLE>, w INT, h INT",
    )
    out = df.withColumn(
        "nb", recenter_clamp(F.col("bbox"), F.col("w"), F.col("h"), F.lit(100), F.lit(80))
    )
    for r in out.collect():
        bbox, w, h = cases[r["i"]]
        assert r["nb"] == _ref_recenter_clamp(bbox, w, h, 100, 80), cases[r["i"]]


def test_preprocess_manifest(spark):
    listing = spark.createDataFrame(
        [
            ("data/datasets/d2/dogs_eating/a.mov",),
            ("data/datasets/d2/dogs_eating/b.MP4",),
            ("data/datasets/d2/dogs_walking/c.mp4",),
            ("data/datasets/d2/dogs_walking/notes.txt",),   # wrong extension
            ("data/datasets/d2/cats_flying/d.mp4",),        # unknown folder
        ],
        "path STRING",
    )
    done = spark.createDataFrame([("data/datasets/d2/dogs_eating/a.mov",)], "file_path STRING")
    out = {r["file_path"]: r["action"] for r in derive_action_manifest(listing, done).collect()}
    assert out == {
        "data/datasets/d2/dogs_eating/b.MP4": "eat",
        "data/datasets/d2/dogs_walking/c.mp4": "walk",
    }


def test_a2d_manifest_fallthrough(spark):
    vs = spark.createDataFrame(
        [("y1", 71), ("y2", 72), ("y3", 74), ("y4", 78), ("y5", 99)],
        "youtube_id STRING, action_label INT",
    )
    out = {r["youtube_id"]: r["action"] for r in a2d_manifest(vs).collect()}
    # 71/74 pass through numerically (pandas .replace semantics); 99 filtered
    assert out == {"y1": "71", "y2": "play", "y3": "74", "y4": "run"}


def test_merge_to_raw_continues_dense_ids(spark):
    catalog = spark.createDataFrame(
        [(0, "000000.mp4", "a2d", "play", "x/1.mp4"), (2, "000002.mp4", "a2d", "run", "x/2.mp4")],
        "file_index BIGINT, file_path STRING, dataset STRING, action STRING, original_file_path STRING",
    )
    manifest = spark.createDataFrame(
        [("p/b.mp4", "eat"), ("p/a.mp4", "walk")], "file_path STRING, action STRING"
    )
    out = merge_to_raw(catalog, manifest, "drive_1")
    rows = {r["file_index"]: r for r in out.collect()}
    assert sorted(rows) == [0, 2, 3, 4]
    assert rows[3]["original_file_path"] == "p/a.mp4"  # path order, not input order
    assert rows[3]["file_path"] == "000003.mp4"
    assert rows[4]["action"] == "eat"
    assert rows[3]["dataset"] == "drive_1"


def test_merge_to_raw_empty_catalog(spark):
    manifest = spark.createDataFrame([("p/a.mp4", "eat")], "file_path STRING, action STRING")
    out = merge_to_raw(None, manifest, "d")
    r = out.collect()[0]
    assert (r["file_index"], r["file_path"]) == (0, "000000.mp4")


def test_curate_corpus_end_to_end(spark, tmp_path):
    from dog_data_pipeline_spark.pipelines.curate import curate_corpus
    from dog_data_pipeline_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, SF_DIR, "documents")
    # plant an exact duplicate so the dedup stage has work
    dup = docs.limit(3).select(
        (F.col("doc_id") + 10**6).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(dup)
    bench = docs.filter(F.col("source") == "src1").select("doc_id", "text")
    out = str(tmp_path / "curated")
    res = curate_corpus(
        corpus.filter(F.col("source") != "src1"),
        bench,
        output_path=out,
        num_shards=4,
    )
    s = res.stats
    assert s["after_quality"] <= s["input"]
    assert s["after_exact_dedup"] < s["after_quality"]  # planted dups removed
    assert s["after_decontamination"] <= s["after_exact_dedup"]
    assert s["chunks"] > 0 and s["shards"] == 4
    # a training sequence's chunks never split across export shards
    packed = spark.read.parquet(out)
    assert packed.count() == s["chunks"]
    # every curated doc id appears in the packed output
    kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
    packed_ids = {r["doc_id"] for r in packed.select("doc_id").distinct().collect()}
    assert packed_ids == kept_ids


def test_curate_cli_smoke(spark, tmp_path):
    import subprocess, sys

    from dog_data_pipeline_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_in")
    docs.limit(60).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "dog_data_pipeline_spark", "curate",
         "--input", src, "--output", out, "--num-shards", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "curate: chunks" in r.stdout
    assert os.path.isdir(out)


def test_curate_corpus_full_stage_set(spark):
    """All optional stages on: classifier gate, source caps, segment
    dedup. Checks stage ordering effects: caps bound per-source counts,
    segment dedup rewrites text and drops fully-duplicated docs."""
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.pipelines.curate import curate_corpus
    from dog_data_pipeline_spark.tables import load

    docs = load(spark, SF_DIR, "documents").limit(120)
    # a doc whose text fully duplicates another doc's (same source keys)
    clone = docs.limit(1).select(
        (F.col("doc_id") + 10**6).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(clone)
    res = curate_corpus(
        corpus,
        None,
        min_quality=0.0,
        max_dup_token_frac=1.0,
        min_classifier_score=0.2,
        source_col="source",
        source_cap=5,
        segment_dedup_tokens=16,
        span_dedup_window_tokens=8,
    )
    s = res.stats
    assert s["after_quality"] <= s["input"]
    assert s["after_source_cap"] <= s["after_quality"]
    per_source = (
        res.kept.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_source <= 5
    # exact dedup removed the clone before segment dedup saw it
    assert s["after_exact_dedup"] <= s["after_source_cap"]
    assert s["after_segment_dedup"] <= s["after_exact_dedup"]
    assert s["after_span_dedup"] <= s["after_segment_dedup"]
    # segment-level survivors have non-empty rewritten text
    assert res.kept.filter(F.length("text") == 0).count() == 0
    assert set(res.kept.columns) == {"doc_id", "text", "lang", "source", "n_chars"}


def test_curate_corpus_mixture_stage(spark):
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.pipelines.curate import curate_corpus
    from dog_data_pipeline_spark.tables import load

    docs = load(spark, SF_DIR, "documents").limit(120)
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    res = curate_corpus(
        docs,
        None,
        min_quality=0.0,
        max_dup_token_frac=1.0,
        source_col="source",
        mixture_budget_tokens=float(total_tokens) / 3.0,
    )
    s = res.stats
    assert 0 < s["after_mixture"] < s["after_decontamination"]
    kept_tokens = res.kept.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    # budget is an expected value, not a hard cap; generous envelope
    assert kept_tokens < total_tokens
    # the helper token column must not leak into the output
    assert set(res.kept.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    import pytest

    with pytest.raises(ValueError):
        curate_corpus(docs, None, mixture_budget_tokens=100.0)

"""Smoke tests for the CLI dispatch (``python -m dog_data_pipeline_spark``),
driving every named pipeline end-to-end through its subcommand, in-process
(a subprocess would pay a full second SparkSession startup per command).
"""

from __future__ import annotations

import os

import pytest

from dog_data_pipeline_spark.__main__ import main


@pytest.fixture()
def workdir(tmp_path):
    return tmp_path


def _read_csv_dir(spark, path, schema):
    return spark.read.csv(str(path), header=True, schema=schema)


def test_cli_preprocess_and_merge_raw(spark, workdir):
    # stage-1 input: a folder-per-action tree of (fake) video files
    for folder, names in [
        ("dogs_eating", ["a.mp4", "b.mov"]),
        ("dogs_playing", ["c.mp4"]),
        ("not_a_dog_folder", ["d.mp4"]),
        ("dogs_walking", ["skip.txt"]),
    ]:
        d = workdir / "in" / folder
        d.mkdir(parents=True)
        for n in names:
            (d / n).write_bytes(b"x")

    manifest = str(workdir / "manifest.csv")
    rc = main(
        ["preprocess", "--input-dir", str(workdir / "in"), "--manifest", manifest]
    )
    assert rc == 0
    rows = _read_csv_dir(spark, manifest, "file_path STRING, action STRING").collect()
    got = {(os.path.basename(r["file_path"]), r["action"]) for r in rows}
    assert got == {("a.mp4", "eat"), ("b.mov", "eat"), ("c.mp4", "play")}

    catalog = str(workdir / "catalog.csv")
    rc = main(
        ["merge-raw", "--manifest", manifest, "--catalog", catalog, "--dataset", "d1"]
    )
    assert rc == 0
    cat = _read_csv_dir(
        spark,
        catalog,
        "file_index LONG, file_path STRING, dataset STRING, action STRING, "
        "original_file_path STRING",
    ).collect()
    assert {r["file_index"] for r in cat} == {0, 1, 2}
    assert all(r["file_path"].endswith(".mp4") for r in cat)

    # idempotent re-merge: second run continues dense ids from the max
    rc = main(
        ["merge-raw", "--manifest", manifest, "--catalog", catalog, "--dataset", "d2"]
    )
    assert rc == 0
    cat2 = _read_csv_dir(
        spark,
        catalog,
        "file_index LONG, file_path STRING, dataset STRING, action STRING, "
        "original_file_path STRING",
    ).collect()
    assert {r["file_index"] for r in cat2} == {0, 1, 2, 3, 4, 5}


def test_cli_track_samples(spark, workdir):
    det_rows = []
    for f in range(13):
        det_rows.append(("000000.mp4", f, 1, [10.0, 10.0, 30.0, 40.0], 16))
    detections = spark.createDataFrame(
        det_rows,
        "video_id STRING, frame_idx INT, subject_id INT, bbox ARRAY<DOUBLE>, cls INT",
    )
    metadata = spark.createDataFrame(
        [("000000.mp4", 13, 480, 640, 2)],
        "video_id STRING, frame_count INT, frame_height INT, frame_width INT, video_fps INT",
    )
    det_path = str(workdir / "det.parquet")
    meta_path = str(workdir / "meta.parquet")
    detections.write.parquet(det_path)
    metadata.write.parquet(meta_path)

    catalog = spark.createDataFrame(
        [(0, "000000.mp4", "d1", "eat", "/orig/a.mp4")],
        "file_index LONG, file_path STRING, dataset STRING, action STRING, "
        "original_file_path STRING",
    )
    cat_path = str(workdir / "catalog.csv")
    catalog.write.mode("overwrite").option("header", True).csv(cat_path)

    samples = str(workdir / "samples.csv")
    errors = str(workdir / "errors.csv")
    rc = main(
        [
            "track-samples",
            "--detections", det_path,
            "--metadata", meta_path,
            "--catalog", cat_path,
            "--samples", samples,
            "--errors", errors,
        ]
    )
    assert rc == 0
    out = _read_csv_dir(
        spark,
        samples,
        "file_path STRING, original_file STRING, segment STRING, dataset STRING, "
        "action STRING",
    ).collect()
    # subject 1 is complete in segments 0..2
    assert {r["segment"] for r in out} == {"000", "001", "002"}
    assert all(r["action"] == "eat" for r in out)


def test_cli_query_unknown_name_is_error():
    assert main(["query", "no_such_query"]) == 2


def test_curate_cli_full_stage_flags(spark, tmp_path):
    import subprocess, sys, os

    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_in")
    docs.limit(60).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "dog_data_pipeline_spark", "curate",
         "--input", src, "--output", out, "--num-shards", "2",
         "--min-quality", "0.0",
         "--min-classifier-score", "0.1",
         "--source-col", "source", "--source-cap", "4",
         "--segment-dedup-tokens", "16"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "curate: after_source_cap" in r.stdout
    assert "curate: after_segment_dedup" in r.stdout
    assert os.path.isdir(out)


def test_cli_ivf_build_append_query_roundtrip(spark, tmp_path):
    """The persisted-IVF serving path end-to-end through the CLI:
    build on 80% of the corpus, append the remaining 20% (exit 0 —
    no drift), query the appended index and get full-k rows; a
    centroid-aimed hot batch then trips the drift guard (exit 3)."""
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus_p = str(tmp_path / "corpus")
    batch_p = str(tmp_path / "batch")
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(corpus_p)
    emb.filter(F.col("vec_id") % 5 == 0).write.parquet(batch_p)
    idx = str(tmp_path / "idx")

    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "8"]) == 0
    assert main(["ivf-append", "--input", batch_p, "--index", idx]) == 0

    queries_p = str(tmp_path / "queries")
    emb.filter(F.col("vec_id") < 3).write.parquet(queries_p)
    out_p = str(tmp_path / "knn")
    assert main(["ivf-query", "--index", idx, "--queries", queries_p,
                 "--k", "5", "--output", out_p]) == 0
    knn = spark.read.parquet(out_p)
    assert knn.count() == 15  # 3 queries x full k=5
    assert knn.groupBy("query_id").count().filter("count != 5").count() == 0

    # drift guard through the CLI: a hot batch aimed at one centroid
    import json
    import os

    hot = json.load(open(os.path.join(idx, "ivf_meta.json")))["centroids"][0]
    n_total = emb.count()
    hot_df = spark.range(3 * n_total).select(
        (F.col("id") + 10**6).alias("vec_id"),
        F.array(*[F.lit(float(x)) for x in hot]).alias("embedding"),
    )
    hot_p = str(tmp_path / "hot")
    hot_df.write.parquet(hot_p)
    assert main(["ivf-append", "--input", hot_p, "--index", idx,
                 "--skew-bound", "2.0"]) == 3

    # sidecar audit through the CLI: consistent now; a rolled-back
    # sidecar is flagged (exit 4) and --repair restores it (exit 0)
    meta_path = os.path.join(idx, "ivf_meta.json")
    assert main(["ivf-verify", "--index", idx]) == 0
    meta = json.load(open(meta_path))
    meta["cell_counts"] = {k: 1 for k in meta["cell_counts"]}
    json.dump(meta, open(meta_path, "w"))
    assert main(["ivf-verify", "--index", idx]) == 4
    assert main(["ivf-verify", "--index", idx, "--repair"]) == 0
    assert main(["ivf-verify", "--index", idx]) == 0


def test_cli_ivf_pq_build_and_query_modes(spark, tmp_path):
    """PQ serving through the CLI: --pq-m-sub persists codes +
    codebooks, ivf-query auto-uses the ADC path, --no-pq forces the
    raw path (bit-identical to a codeless index would be), and
    --balance-bound 0 disables the default mass balancing."""
    import json
    import os

    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus_p = str(tmp_path / "corpus")
    emb.write.parquet(corpus_p)
    idx = str(tmp_path / "idx_pq")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "8", "--pq-m-sub", "8", "--pq-ksub", "16"]) == 0
    meta = json.load(open(os.path.join(idx, "ivf_meta.json")))
    assert meta["pq"]["m_sub"] == 8 and meta["pq"]["ksub"] == 16
    assert meta["balance_bound"] == 4.0  # CLI default matches library

    queries_p = str(tmp_path / "queries")
    emb.filter(F.col("vec_id") < 3).write.parquet(queries_p)
    adc_p, raw_p = str(tmp_path / "adc"), str(tmp_path / "raw")
    assert main(["ivf-query", "--index", idx, "--queries", queries_p,
                 "--k", "5", "--output", adc_p]) == 0
    assert main(["ivf-query", "--index", idx, "--queries", queries_p,
                 "--k", "5", "--no-pq", "--output", raw_p]) == 0
    adc = spark.read.parquet(adc_p)
    raw = spark.read.parquet(raw_p)
    assert adc.count() == 15 and raw.count() == 15
    # the ADC+exact-rerank cosines are exact, so wherever the two paths
    # return the same pair the values agree bit-for-bit
    joined = adc.alias("a").join(
        raw.alias("r"), ["query_id", "vec_id"]
    ).filter("a.cosine != r.cosine")
    assert joined.count() == 0

    # plain (unbalanced) build via --balance-bound 0
    idx2 = str(tmp_path / "idx_plain")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx2,
                 "--n-lists", "8", "--balance-bound", "0"]) == 0
    assert json.load(open(os.path.join(idx2, "ivf_meta.json")))[
        "balance_bound"
    ] is None


def test_cli_ivf_compact(spark, tmp_path):
    """ivf-compact through the CLI: appends accumulate files, compact
    bounds them, results and sidecar unchanged (exit 0 both when it
    compacts and when the layout is already tight)."""
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus_p = str(tmp_path / "corpus")
    batch_p = str(tmp_path / "batch")
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(corpus_p)
    emb.filter(F.col("vec_id") % 5 == 0).write.parquet(batch_p)
    idx = str(tmp_path / "idx")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "8"]) == 0
    assert main(["ivf-append", "--input", batch_p, "--index", idx]) == 0
    assert main(["ivf-compact", "--index", idx,
                 "--max-files-per-cell", "1"]) == 0
    assert main(["ivf-verify", "--index", idx]) == 0
    # second call: already tight -> no-op, still exit 0
    assert main(["ivf-compact", "--index", idx,
                 "--max-files-per-cell", "1"]) == 0


def test_cli_ivf_delete_upsert(spark, tmp_path):
    """ivf-delete / ivf-upsert through the CLI: build with
    --enable-upsert, tombstone one id inline, upsert a replacement
    batch from parquet, major-compact with --fold-all, and verify —
    the deleted id is gone from query output and the store drains."""
    import json
    import os

    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus_p = str(tmp_path / "corpus")
    emb.write.parquet(corpus_p)
    idx = str(tmp_path / "idx")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "8", "--enable-upsert"]) == 0

    assert main(["ivf-delete", "--index", idx, "--ids", "7"]) == 0
    up_p = str(tmp_path / "up")
    emb.filter(F.col("vec_id") == 9).select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(1.0)).alias("embedding"),
    ).write.parquet(up_p)
    assert main(["ivf-upsert", "--input", up_p, "--index", idx]) == 0

    queries_p = str(tmp_path / "queries")
    emb.filter(F.col("vec_id") < 3).write.parquet(queries_p)
    out_p = str(tmp_path / "out")
    assert main(["ivf-query", "--index", idx, "--queries", queries_p,
                 "--output", out_p, "--k", "5", "--n-probe", "8"]) == 0
    got = {r["vec_id"] for r in spark.read.parquet(out_p).collect()}
    assert 7 not in got

    assert main(["ivf-compact", "--index", idx, "--fold-all"]) == 0
    meta = json.load(open(os.path.join(idx, "ivf_meta.json")))
    assert meta["upsert"]["n_tombstones"] == 0
    assert main(["ivf-verify", "--index", idx]) == 0


def test_cli_ivf_delete_id_coercion(spark, tmp_path):
    """reviewer r12: inline --ids coerce UNIFORMLY per the index
    sidecar's id type — numeric-looking tokens on a STRING id column
    stay strings ('007' matches instead of silently becoming int 7),
    mixed tokens never build a mixed-type column — and --id-type /
    the legacy digit-heuristic fallbacks behave."""
    import json
    import os

    from dog_data_pipeline_spark.__main__ import _coerce_inline_ids, main
    from dog_data_pipeline_spark.operators.similarity import build_ivf_index

    rows = [(f"{i:03d}", [float(i % 7)] * 8) for i in range(50)]
    corpus = spark.createDataFrame(
        rows, "doc_id string, embedding array<double>"
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(
        corpus, idx, n_lists=4, seed=1, id_col="doc_id",
        vec_col="embedding", enable_upsert=True,
    )

    # sidecar-typed: string id column keeps digit-like tokens as strings
    assert _coerce_inline_ids(["007", "abc"], idx, None) == ["007", "abc"]
    # explicit override beats the sidecar
    assert _coerce_inline_ids(["7"], idx, "int") == [7]
    # legacy fallback (no sidecar): all-digit -> ints, mixed -> strings
    nowhere = str(tmp_path / "nope")
    assert _coerce_inline_ids(["7", "8"], nowhere, None) == [7, 8]
    assert _coerce_inline_ids(["7", "abc"], nowhere, None) == ["7", "abc"]

    # end to end: '007' tombstones the string id (2/50 = 4% < 10%: exit 0)
    assert main(["ivf-delete", "--index", idx, "--ids", "007", "zzz"]) == 0
    meta = json.load(open(os.path.join(idx, "ivf_meta.json")))
    assert meta["upsert"]["n_tombstones"] == 2

    # fold_recommended surfaces as exit 3 (mirror of ivf-append's
    # rebuild exit): push tombstones past 10% of indexed rows
    assert main([
        "ivf-delete", "--index", idx, "--ids",
        *[f"{i:03d}" for i in range(10)],
    ]) == 3


def test_cli_ivf_verify_cwd_joined_identity_hint(spark, tmp_path, capsys):
    """r11 verdict ask #8: ivf-verify detects the pre-fix CWD-JOINED
    stream identity (os.path.abspath of a URI checkpoint — an absolute
    path with an embedded `scheme:/` segment) and prints the
    clear-the-sidecar migration recipe; a verbatim URI identity stays
    silent."""
    import json
    import os

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.operators.similarity import build_ivf_index

    corpus = spark.createDataFrame(
        [(i, [float(i % 5)] * 8) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "idx")
    build_ivf_index(corpus, idx, n_lists=4, seed=1)
    meta_p = os.path.join(idx, "ivf_meta.json")

    meta = json.load(open(meta_p))
    meta["last_stream_id"] = "/scratch/app-123/s3:/bucket/ck"
    meta["last_stream_batch"] = 7
    with open(meta_p, "w") as fh:
        json.dump(meta, fh)
    assert main(["ivf-verify", "--index", idx]) == 0
    out = capsys.readouterr().out
    assert "CWD-JOINED" in out and "last_stream_batch" in out

    meta["last_stream_id"] = "s3://bucket/ck"  # verbatim: healthy
    with open(meta_p, "w") as fh:
        json.dump(meta, fh)
    assert main(["ivf-verify", "--index", idx]) == 0
    assert "CWD-JOINED" not in capsys.readouterr().out


def test_cli_ivf_filtered_query(spark, tmp_path):
    """ivf-build --attr-cols + ivf-query --where through the CLI: the
    filtered result contains only matching ids (pre-filter — full k
    rows despite the selective predicate)."""
    from pyspark.sql import functions as F

    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    corpus_p = str(tmp_path / "corpus")
    emb.write.parquet(corpus_p)
    idx = str(tmp_path / "idx")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "4", "--attr-cols", "label"]) == 0
    queries_p = str(tmp_path / "queries")
    emb.filter(F.col("vec_id") < 2).write.parquet(queries_p)
    out_p = str(tmp_path / "out")
    assert main(["ivf-query", "--index", idx, "--queries", queries_p,
                 "--output", out_p, "--k", "5", "--n-probe", "4",
                 "--where", "label = 2"]) == 0
    got = spark.read.parquet(out_p)
    n = got.count()
    assert n > 0
    labels = {
        r["label"]
        for r in got.join(emb.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels == {2}


def test_cli_ivf_snapshot(spark, tmp_path):
    """ivf-snapshot through the CLI: the destination is a complete,
    verifiable index."""
    from dog_data_pipeline_spark.__main__ import main
    from dog_data_pipeline_spark.tables import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus_p = str(tmp_path / "corpus")
    emb.write.parquet(corpus_p)
    idx, snap = str(tmp_path / "idx"), str(tmp_path / "snap")
    assert main(["ivf-build", "--input", corpus_p, "--index", idx,
                 "--n-lists", "4"]) == 0
    assert main(["ivf-snapshot", "--index", idx, "--dest", snap]) == 0
    assert main(["ivf-verify", "--index", snap]) == 0

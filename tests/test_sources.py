"""Sources/sinks tests: catalog atomic swap, JSON map round-trip,
binary file listing + path parsing."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dog_data_pipeline_spark.sources import (
    list_binary_files,
    parse_path_components,
    read_catalog_csv,
    read_json_map,
    write_catalog_atomic,
)


def test_catalog_atomic_roundtrip_and_self_referential_rewrite(spark, tmp_path):
    path = str(tmp_path / "labels.csv")
    df = spark.createDataFrame(
        [(0, "000000.mp4", "a2d", "play", "x/1.mp4")],
        "file_index BIGINT, file_path STRING, dataset STRING, action STRING, original_file_path STRING",
    )
    write_catalog_atomic(df, path)
    back = read_catalog_csv(spark, path)
    assert back.count() == 1

    # the unsafe reference pattern, made safe: read -> union -> overwrite SAME path
    new = back.unionByName(
        spark.createDataFrame(
            [(1, "000001.mp4", "drive", "eat", "y/2.mp4")], back.schema
        )
    )
    write_catalog_atomic(new, path)
    final = read_catalog_csv(spark, path)
    assert sorted(r["file_index"] for r in final.collect()) == [0, 1]
    assert not [p for p in os.listdir(tmp_path) if "__staging" in p or "__old" in p]


def test_json_map_roundtrip(spark, tmp_path):
    path = str(tmp_path / "path_action_dict.json")
    with open(path, "w") as f:
        json.dump({"a/b.mp4": "eat", "c/d.mp4": "walk"}, f)
    df = read_json_map(spark, path)
    got = {r["file_path"]: r["action"] for r in df.collect()}
    assert got == {"a/b.mp4": "eat", "c/d.mp4": "walk"}

    from dog_data_pipeline_spark.sources import write_json_map

    out_path = str(tmp_path / "out.json")
    write_json_map(df, out_path)
    with open(out_path) as f:
        assert json.load(f) == {"a/b.mp4": "eat", "c/d.mp4": "walk"}


def test_distributed_copy_with_idempotence(spark, tmp_path):
    from dog_data_pipeline_spark.sources import execute_copies, plan_copies

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    for i in range(5):
        (src / f"{i}.mp4").write_bytes(bytes([i] * 10))
    (dst / "000001.mp4").write_bytes(bytes([1] * 10))  # already copied

    listing = list_binary_files(spark, str(src), glob="*.mp4")
    named = parse_path_components(listing).select(
        "path", F.format_string("%06d.mp4", F.col("stem").cast("int")).alias("dst_name")
    )
    done = spark.createDataFrame(
        [(str(dst / "000001.mp4"),)], "dst_path STRING"
    )
    plan = plan_copies(named, str(dst), done=done)
    n = execute_copies(plan)
    assert n == 4  # idempotent skip of the pre-existing file
    assert sorted(p.name for p in dst.iterdir()) == [
        "000000.mp4", "000001.mp4", "000002.mp4", "000003.mp4", "000004.mp4",
    ]
    assert (dst / "000003.mp4").read_bytes() == bytes([3] * 10)
    # re-running the full plan is a no-op result-wise
    n2 = execute_copies(plan_copies(named, str(dst), done=done))
    assert (dst / "000003.mp4").read_bytes() == bytes([3] * 10)


def test_binary_listing_and_path_parse(spark, tmp_path):
    (tmp_path / "dogs_eating").mkdir()
    (tmp_path / "dogs_eating" / "a.mp4").write_bytes(b"\x00fakevideo")
    (tmp_path / "dogs_eating" / "b.MOV").write_bytes(b"\x00fake2")
    (tmp_path / "dogs_eating" / "skip.txt").write_text("no")
    df = list_binary_files(spark, str(tmp_path), glob="*.{mp4,MOV}")
    parsed = parse_path_components(df)
    got = {
        r["file_name"]: (r["extension"], r["parent_dir"], r["stem"])
        for r in parsed.collect()
    }
    assert got == {
        "a.mp4": ("mp4", "dogs_eating", "a"),
        "b.MOV": ("mov", "dogs_eating", "b"),
    }
    assert "content" not in df.columns  # metadata-only listing prunes payload
    with_payload = list_binary_files(spark, str(tmp_path), glob="*.mp4", with_content=True)
    assert with_payload.select("content").collect()[0]["content"] == b"\x00fakevideo"


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------


def test_schema_merge_backfills_nulls_for_old_generation(spark, tmp_path):
    from dog_data_pipeline_spark.sources.evolution import read_merged

    spark.createDataFrame([(1, "a")], "id BIGINT, s STRING").write.parquet(
        str(tmp_path / "gen=1")
    )
    spark.createDataFrame(
        [(2, "b", 99)], "id BIGINT, s STRING, extra BIGINT"
    ).write.parquet(str(tmp_path / "gen=2"))
    got = {r["id"]: r for r in read_merged(spark, str(tmp_path)).collect()}
    assert got[1]["extra"] is None
    assert got[2]["extra"] == 99


def test_schema_drift_report_lists_backfill_worklist(spark, tmp_path):
    from dog_data_pipeline_spark.sources.evolution import schema_drift_report

    spark.createDataFrame([(1, "a")], "id BIGINT, s STRING").coalesce(
        1
    ).write.parquet(str(tmp_path / "gen=1"))
    spark.createDataFrame(
        [(2, "b", 99)], "id BIGINT, s STRING, extra BIGINT"
    ).coalesce(1).write.parquet(str(tmp_path / "gen=2"))
    rows = schema_drift_report(spark, str(tmp_path)).collect()
    lagging = [r for r in rows if r["n_missing"] > 0]
    current = [r for r in rows if r["n_missing"] == 0]
    assert len(lagging) == 1 and len(current) == 1
    assert lagging[0]["missing_cols"] == ["extra"]
    assert "gen=1" in lagging[0]["file"]

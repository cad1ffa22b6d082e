"""Multimodal plumbing e2e: fake-codec videos through probe → decode →
track (load-once detector) → crop → encode, verifying real byte flow."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dog_data_pipeline_spark.multimodal import codec
from dog_data_pipeline_spark.multimodal.video import (
    crop_tracks,
    decode_frames,
    encode_tracks,
    probe_metadata,
    run_tracking,
)


@pytest.fixture(scope="module")
def videos_df(spark):
    def frames(vid_seed, n, w, h):
        return [bytes([(vid_seed * 31 + i * 7 + j) % 251 for j in range(w * h)]) for i in range(n)]

    rows = [
        ("v1", codec.make_fake_video(2, 8, 6, frames(1, 5, 8, 6))),
        ("v2", codec.make_fake_video(3, 10, 4, frames(2, 7, 10, 4))),
    ]
    return spark.createDataFrame(rows, "video_id STRING, content BINARY")


def test_probe_metadata(spark, videos_df):
    got = {
        r["video_id"]: (r["frame_count"], r["frame_height"], r["frame_width"], r["video_fps"])
        for r in probe_metadata(videos_df).drop("content").collect()
    }
    assert got == {"v1": (5, 6, 8, 2), "v2": (7, 4, 10, 3)}


def test_decode_frames_order_and_bytes(spark, videos_df):
    frames = decode_frames(videos_df)
    v1 = frames.filter(F.col("video_id") == "v1").orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in v1] == [0, 1, 2, 3, 4]
    assert all(len(r["frame"]) == 8 * 6 for r in v1)
    # frame content round-trips exactly
    expected0 = bytes([(1 * 31 + 0 * 7 + j) % 251 for j in range(48)])
    assert bytes(v1[0]["frame"]) == expected0


def test_tracking_deterministic_and_partition_safe(spark, videos_df):
    frames = decode_frames(videos_df)
    det1 = run_tracking(frames, num_partitions=1).collect()
    det8 = run_tracking(frames, num_partitions=8).collect()
    k = lambda r: (r["video_id"], r["frame_idx"], r["subject_id"])
    assert sorted(map(k, det1)) == sorted(map(k, det8))  # parallelism-invariant
    # subjects 1 and 2 on every frame (12 frames total), subject 3 on ~half
    assert 24 <= len(det1) <= 36
    per_frame = {}
    for r in det1:
        per_frame.setdefault((r["video_id"], r["frame_idx"]), set()).add(r["subject_id"])
    assert all({1, 2} <= subs for subs in per_frame.values())


def test_crop_and_encode_roundtrip(spark, videos_df):
    frames = decode_frames(videos_df).filter(F.col("video_id") == "v1")
    tracks = frames.select(
        "video_id", "frame_idx", F.lit(7).alias("subject_id"),
        F.array(F.lit(2), F.lit(1), F.lit(6), F.lit(5)).alias("new_bbox"),
    )
    crops = crop_tracks(frames, tracks)
    r0 = crops.filter(F.col("frame_idx") == 0).collect()[0]
    frame0 = bytes([(1 * 31 + 0 * 7 + j) % 251 for j in range(48)])
    expected_crop = b"".join(frame0[y * 8 + 2 : y * 8 + 6] for y in range(1, 5))
    assert bytes(r0["crop"]) == expected_crop  # real byte-grid crop

    encoded = encode_tracks(crops, fps=2).collect()
    assert len(encoded) == 1
    blob = bytes(encoded[0]["video"])
    fps, dec = codec.decode_video(blob)
    assert (fps, len(dec)) == (2, 5)
    assert bytes(dec[0]) == expected_crop  # encode → decode round-trip


def test_full_video_chain_decode_track_segment_crop_encode(spark):
    """The complete stage-3 flow over real bytes: fake videos → decode →
    tracking inference → tumbling segmentation (+1 overlap) → frequency +
    completeness selection → max-extent clamp transform → crop → encode."""
    from dog_data_pipeline_spark.pipelines.tracking import (
        segment_frames,
        select_complete_dog_tracks,
        transform_tracks_max_extent,
    )

    w, h, fps, n = 40, 30, 2, 13  # fps*2=4 frames/segment; pad 17x17 fits
    frames = [bytes([(i * 7 + j) % 251 for j in range(w * h)]) for i in range(n)]
    videos = spark.createDataFrame(
        [("v1", codec.make_fake_video(fps, w, h, frames))],
        "video_id STRING, content BINARY",
    )
    meta = probe_metadata(videos).select(
        "video_id", "frame_count", "frame_height", "frame_width", "video_fps"
    )
    decoded = decode_frames(videos)
    # constant-subject detector: complete track, always class 16
    det_factory = lambda: (lambda frame, width, height: [(1, [2.0, 1.0, 9.0, 8.0], 16)])
    detections = run_tracking(decoded, det_factory)
    segmented = segment_frames(detections, meta, segment_length_sec=2)
    selected = select_complete_dog_tracks(segmented, 16, 0.3)
    transformed = transform_tracks_max_extent(segmented, selected)
    crops = crop_tracks(
        decoded,
        transformed.select("video_id", "frame_idx", "segment_id", "subject_id", "new_bbox"),
    )
    encoded = encode_tracks(crops, fps=fps).collect()
    # one clip per (segment, subject): segments 0,1,2 qualify (13 frames,
    # n=4: starts 0,4,8 full; trailing start 12 short → dropped)
    got = {(r["segment_id"], r["subject_id"]): r for r in encoded}
    assert set(got) == {(0, 1), (1, 1), (2, 1)}
    for (seg, _), r in got.items():
        fps_out, dec_frames = codec.decode_video(bytes(r["video"]))
        assert fps_out == fps
        assert all(len(f) == 17 * 17 for f in dec_frames)  # uniform pad 7+10
        assert len(dec_frames) == 5  # 4 + the +1 overlap frame


def test_fused_track_videos_matches_composed(spark, videos_df):
    """track_videos (fused decode+track, frames never shuffle) must emit
    exactly the detections of decode_frames → run_tracking."""
    from dog_data_pipeline_spark.multimodal.video import track_videos

    composed = run_tracking(decode_frames(videos_df), num_partitions=4).collect()
    fused = track_videos(videos_df, num_partitions=4).collect()
    k = lambda r: (r["video_id"], r["frame_idx"], r["subject_id"],
                   tuple(r["bbox"]), r["cls"])
    assert sorted(map(k, fused)) == sorted(map(k, composed))


def test_fused_sample_tracks_matches_composed(spark):
    """sample_tracks (cogrouped crop+encode) must emit byte-identical
    clips to crop_tracks → encode_tracks on the full stage-3 flow."""
    from dog_data_pipeline_spark.multimodal.video import sample_tracks, track_videos
    from dog_data_pipeline_spark.pipelines.tracking import (
        segment_frames,
        select_complete_dog_tracks,
        transform_tracks_max_extent,
    )

    w, h, fps, n = 40, 30, 2, 13
    frames = [bytes([(i * 7 + j) % 251 for j in range(w * h)]) for i in range(n)]
    videos = spark.createDataFrame(
        [("v1", codec.make_fake_video(fps, w, h, frames))],
        "video_id STRING, content BINARY",
    )
    meta = probe_metadata(videos).select(
        "video_id", "frame_count", "frame_height", "frame_width", "video_fps"
    )
    det_factory = lambda: (lambda frame, width, height: [(1, [2.0, 1.0, 9.0, 8.0], 16)])
    detections = track_videos(videos, det_factory)
    segmented = segment_frames(detections, meta, segment_length_sec=2)
    selected = select_complete_dog_tracks(segmented, 16, 0.3)
    transformed = transform_tracks_max_extent(segmented, selected).select(
        "video_id", "frame_idx", "segment_id", "subject_id", "new_bbox"
    )

    composed = encode_tracks(crop_tracks(decode_frames(videos), transformed), fps=fps)
    fused = sample_tracks(videos, transformed, fps=fps)
    key = lambda r: (r["video_id"], r["segment_id"], r["subject_id"])
    got_c = {key(r): (r["n_frames"], bytes(r["video"])) for r in composed.collect()}
    got_f = {key(r): (r["n_frames"], bytes(r["video"])) for r in fused.collect()}
    assert got_f == got_c
    assert len(got_f) == 3


def test_real_codec_is_cleanly_stubbed():
    with pytest.raises(NotImplementedError):
        codec.probe(b"\x00\x00notfake")


def test_real_codec_roundtrip_under_cv2():
    """Auto-activates the day the image ships cv2: encode a grayscale
    clip through the real mp4 path and decode it back."""
    cv2 = pytest.importorskip("cv2")
    _ = cv2
    w, h = 32, 24
    frames = [bytes([(i * 5 + j) % 256 for j in range(w * h)]) for i in range(4)]
    blob = codec._real_encode(10, w, h, frames)
    assert len(blob) > 0
    n, dh, dw, fps = codec._real_probe(blob)
    assert (n, dh, dw, fps) == (4, h, w, 10)
    dfps, decoded = codec._real_decode(blob)
    assert dfps == 10 and len(decoded) == 4
    assert all(len(f) == w * h for f in decoded)


def test_audio_probe_and_features(spark):
    import numpy as np

    from dog_data_pipeline_spark.multimodal.audio import (
        extract_audio_features,
        make_fake_audio,
        probe_audio,
    )

    wave = np.array([100, -50, 0, 25, -25, 25], dtype=np.int16)
    flat = np.zeros(4, dtype=np.int16)
    df = spark.createDataFrame(
        [("x", make_fake_audio(8, wave)), ("flat", make_fake_audio(8, flat))],
        "audio_id STRING, content BINARY",
    )
    meta = {r["audio_id"]: r for r in probe_audio(df).collect()}
    assert meta["x"]["sample_rate"] == 8 and meta["x"]["n_samples"] == 6

    feats = {r["audio_id"]: r for r in extract_audio_features(df).collect()}
    fx = feats["x"]
    assert fx["peak"] == 100
    assert fx["duration_sec"] == 6 / 8
    # zeros are skipped: signs +,-,+,-,+ -> 4 crossings
    assert fx["zero_crossings"] == 4
    expected_rms = float(np.sqrt(np.mean(wave.astype(np.float64) ** 2)))
    assert abs(fx["rms"] - expected_rms) < 1e-9
    assert feats["flat"]["rms"] == 0.0 and feats["flat"]["zero_crossings"] == 0


def test_audio_resample_decimates(spark):
    import numpy as np

    from dog_data_pipeline_spark.multimodal.audio import (
        decode_audio,
        make_fake_audio,
        resample_audio,
    )

    wave = np.arange(16, dtype=np.int16)
    df = spark.createDataFrame(
        [("x", make_fake_audio(16, wave))], "audio_id STRING, content BINARY"
    )
    out = resample_audio(df, factor=4).collect()[0]["content"]
    sr, decoded = decode_audio(bytes(out))
    assert sr == 4
    assert decoded.tolist() == [0, 4, 8, 12]


def test_image_pool_resize_and_stats(spark):
    import numpy as np

    from dog_data_pipeline_spark.multimodal.image import (
        decode_image,
        image_resize_stats,
        make_fake_image,
        pool_resize,
        resize_images,
    )

    # hand-checkable 4x2: pooled = [[(0+1+4+5)//4, (2+3+6+7)//4]] = [[2, 4]]
    grid = np.arange(8, dtype=np.uint8).reshape(2, 4)
    assert pool_resize(grid, 2).tolist() == [[2, 4]]

    df = spark.createDataFrame(
        [("x", make_fake_image(4, 2, grid))], "image_id STRING, content BINARY"
    )
    out = resize_images(df, 2).collect()[0]["content"]
    assert decode_image(bytes(out)).tolist() == [[2, 4]]

    stats = image_resize_stats(df, 2).collect()[0]
    assert (stats["out_width"], stats["out_height"]) == (2, 1)
    assert stats["min_px"] == 2 and stats["max_px"] == 4 and stats["mean_px"] == 3.0


def test_transcode_roundtrips_and_dead_letters(spark):
    from dog_data_pipeline_spark.multimodal.video import transcode_videos

    good = codec.make_fake_video(2, 4, 3, [bytes(range(12)), bytes(range(12))])
    df = spark.createDataFrame(
        [("g", good), ("bad", b"NOTAVIDEO-garbage")],
        "video_id STRING, content BINARY",
    )
    rows = {r["video_id"]: r for r in transcode_videos(df, fps=5).collect()}
    assert rows["g"]["ok"] and rows["g"]["error"] is None
    fps, frames = codec.decode_video(bytes(rows["g"]["content"]))
    assert fps == 5 and len(frames) == 2  # re-encoded at the target fps
    assert not rows["bad"]["ok"] and "NotImplementedError" in rows["bad"]["error"]
    assert bytes(rows["bad"]["content"]) == b"NOTAVIDEO-garbage"  # passthrough


def test_scene_cuts_land_on_planted_luma_jumps(spark):
    import numpy as np

    from dog_data_pipeline_spark.multimodal.codec import make_fake_video
    from dog_data_pipeline_spark.multimodal.video import (
        detect_scene_cuts,
        frame_mean_luma,
    )

    w = h = 8
    y, x = np.mgrid[0:h, 0:w]

    def vid(cuts):  # scene boundaries at the given frame indices
        frames = []
        level = 0
        for i in range(12):
            if i in cuts:
                level += 100
            frames.append((y + x + level).astype(np.uint8).tobytes())
        return make_fake_video(30, w, h, frames)

    videos = spark.createDataFrame(
        [(1, vid({4, 9})), (2, vid(set()))], "video_id LONG, content BINARY"
    )
    luma = frame_mean_luma(videos)
    scenes = {
        (r.video_id, r.scene_idx): (r.start_frame, r.end_frame)
        for r in detect_scene_cuts(luma, threshold=50.0).collect()
    }
    assert scenes[(1, 0)] == (0, 3)
    assert scenes[(1, 1)] == (4, 8)
    assert scenes[(1, 2)] == (9, 11)
    assert scenes[(2, 0)] == (0, 11)
    assert len(scenes) == 4


def test_audio_active_segments_split_on_planted_silence(spark):
    import numpy as np

    from dog_data_pipeline_spark.multimodal.audio import (
        detect_active_segments,
        frame_energy,
        make_fake_audio,
    )

    frame_len = 16
    loud = np.full(frame_len, 50, dtype=np.int64)
    quiet = np.zeros(frame_len, dtype=np.int64)
    # loud [0..2], silent [3..4], loud [5..7]
    wave = np.concatenate([loud] * 3 + [quiet] * 2 + [loud] * 3)
    clips = spark.createDataFrame(
        [(7, make_fake_audio(8000, wave))], "audio_id LONG, content BINARY"
    )
    energy = frame_energy(clips, frame_len=frame_len)
    segs = {
        r.segment_idx: (r.start_frame, r.end_frame, r.n_frames)
        for r in detect_active_segments(energy, threshold=0).collect()
    }
    assert segs == {0: (0, 2, 3), 1: (5, 7, 3)}


def test_write_image_dirs_layout_and_bytes(spark, tmp_path):
    from dog_data_pipeline_spark.multimodal.image import write_image_dirs

    rows = [
        (3, 0, b"aaa"),
        (3, 12, b"bbbb"),
        (7, 1, b"c"),
    ]
    df = spark.createDataFrame(
        rows, "subject_id LONG, frame_idx LONG, content BINARY"
    ).repartition(2)
    root = str(tmp_path / "frames")
    write_image_dirs(df, root, ext="png", pad=5)

    import os

    found = {}
    for sub in os.listdir(root):
        for name in os.listdir(os.path.join(root, sub)):
            with open(os.path.join(root, sub, name), "rb") as fh:
                found[(sub, name)] = fh.read()
    assert found == {
        ("3", "frame-00000.png"): b"aaa",
        ("3", "frame-00012.png"): b"bbbb",
        ("7", "frame-00001.png"): b"c",
    }

    # temp hygiene: a predecessor attempt killed between open and rename
    # left a dot-hidden .tmp behind — rewriting the frame sweeps it (and
    # the rewrite itself stays temp-free on success)
    stale = os.path.join(root, "3", ".frame-00000.png.deadbeef.tmp")
    with open(stale, "wb") as fh:
        fh.write(b"orphan")
    write_image_dirs(df, root, ext="png", pad=5)
    leftovers = [
        n
        for sub in os.listdir(root)
        for n in os.listdir(os.path.join(root, sub))
        if n.endswith(".tmp")
    ]
    assert leftovers == []
    with open(os.path.join(root, "3", "frame-00000.png"), "rb") as fh:
        assert fh.read() == b"aaa"

"""Video near-dup via frame-hash overlap (operators/videodup.py) —
cross-container frame-hash identity, overlap thresholds, boilerplate
frame cut, dirty payloads."""

from __future__ import annotations

import numpy as np

from sigraph_spark.operators.avi import encode_avi_mjpeg
from sigraph_spark.operators.jpeg import encode_jpeg
from sigraph_spark.operators.mp4frames import encode_mp4_samples
from sigraph_spark.operators.videodup import (
    video_frame_hashes,
    video_neardup,
)

W, H = 16, 12


def _frame(k):
    rng = np.random.default_rng(7000 + k)
    rgb = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8).tobytes()
    return encode_jpeg(W, H, rgb, quality=75)


def _video(frame_ids, container):
    jpegs = [_frame(k) for k in frame_ids]
    if container == "avi":
        return encode_avi_mjpeg(jpegs, W, H, fps_num=24)
    return encode_mp4_samples(jpegs, W, H)


def test_cross_container_hash_identity(spark):
    rows = [("a", bytearray(_video([0, 1], "avi"))),
            ("m", bytearray(_video([0, 1], "mp4")))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {(r["id"], r["frame_idx"]): r["dh"]
           for r in video_frame_hashes(df).collect()}
    assert got[("a", 0)] == got[("m", 0)]
    assert got[("a", 1)] == got[("m", 1)]
    assert got[("a", 0)] != got[("a", 1)]


def test_neardup_overlap_threshold(spark):
    rows = [
        ("v0", bytearray(_video([0, 1, 2], "avi"))),
        ("v1", bytearray(_video([1, 2, 3], "mp4"))),   # shares 2 with v0
        ("v2", bytearray(_video([3, 4, 5], "avi"))),   # shares 1 with v1
        ("junk", bytearray(b"\x00not video" * 3)),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {(r["a"], r["b"], r["shared"])
           for r in video_neardup(df, min_shared=2).collect()}
    assert got == {("v0", "v1", 2)}
    # with min_shared=1 the single-frame link appears too
    got1 = {(r["a"], r["b"], r["shared"])
            for r in video_neardup(df, min_shared=1).collect()}
    assert got1 == {("v0", "v1", 2), ("v1", "v2", 1)}


def test_boilerplate_frame_cut(spark):
    # frame 9 is an intro card present in EVERY video; with the DF cut
    # at 3 it must not connect otherwise-unrelated videos
    rows = [(f"v{k}", bytearray(_video([9, k], "avi"))) for k in range(5)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = video_neardup(df, min_shared=1, max_hash_df=3).collect()
    assert got == []

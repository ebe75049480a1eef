"""Multimodal plumbing: mapInPandas schema/batch contracts (stub decode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.multimodal import (
    _decode_image_features,
    gen_media,
    image_features,
    rebalance_by_bytes,
    sample_frames,
)


def test_image_features_schema_and_rows(spark):
    media = gen_media(spark, n=32)
    out = image_features(media)
    assert out.columns == ["media_id", "n_bytes", "feature"]
    rows = out.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["feature"]) == 16
        assert r["n_bytes"] > 0
        assert abs(sum(r["feature"]) - 1.0) < 1e-6  # normalized histogram


def test_decode_stub_handles_null_and_empty():
    assert _decode_image_features(None) == [0.0] * 16
    assert _decode_image_features(b"") == [0.0] * 16


def test_frame_sampling_fanout(spark):
    media = gen_media(spark, n=12)
    frames = sample_frames(media)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # duration (id%5+1) seconds -> that many frames
    assert per["m-0"] == 1 and per["m-4"] == 5
    one = frames.filter(
        (F.col("media_id") == "m-4") & (F.col("frame_idx") == 2)
    ).collect()[0]
    assert one["frame_ts_ms"] == 2000


def test_rebalance_preserves_rows(spark):
    media = gen_media(spark, n=20)
    out = rebalance_by_bytes(media)
    assert out.count() == 20
    assert set(out.columns) == set(media.columns)


def test_features_deterministic_across_partitionings(spark):
    media = gen_media(spark, n=16)
    a = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(1)).collect())
    b = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(8)).collect())
    assert a == b

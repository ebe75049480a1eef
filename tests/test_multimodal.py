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


def test_audio_features_contract(spark):
    from sigraph_spark.operators.multimodal import audio_features

    media = gen_media(spark, n=12)
    out = audio_features(media)
    assert out.columns == ["media_id", "n_windows", "feature"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 12
    # duration (id%5+1)s at 1000ms windows -> that many windows
    assert rows["m-4"]["n_windows"] == 5 and rows["m-0"]["n_windows"] == 1
    for r in rows.values():
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_resize_images_contract(spark):
    from sigraph_spark.operators.multimodal import resize_images

    media = gen_media(spark, n=8)
    out = resize_images(media, width=64, height=64)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert (r["width"], r["height"]) == (64, 64)
        assert len(bytes(r["payload"])) == 64 * 64 // 64  # stub size contract
    # deterministic across partitionings
    a = sorted((r["media_id"], bytes(r["payload"])) for r in rows)
    b = sorted(
        (r["media_id"], bytes(r["payload"]))
        for r in resize_images(media.repartition(5), 64, 64).collect()
    )
    assert a == b


def test_features_deterministic_across_partitionings(spark):
    media = gen_media(spark, n=16)
    a = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(1)).collect())
    b = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media.repartition(8)).collect())
    assert a == b

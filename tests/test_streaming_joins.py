"""Watermarked stream-stream interval join: the streaming result must
equal the identical batch join expression exactly (inner join + range
condition), and state eviction requires the range bound the operator
builds in."""

from __future__ import annotations

import datetime

from sigraph_spark.streaming.joins import interval_join

SCHEMA = "user_id long, ts timestamp, event_id long"


def _streams(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    clicks = [
        (i % 5, base + datetime.timedelta(seconds=60 * i), i) for i in range(40)
    ]
    errors = [
        (i % 5, base + datetime.timedelta(seconds=60 * i + 30), 1000 + i)
        for i in range(0, 40, 3)
    ]
    return (
        spark.createDataFrame(clicks, SCHEMA),
        spark.createDataFrame(errors, SCHEMA),
    )


def test_batch_interval_join_semantics(spark):
    clicks, errors = _streams(spark)
    out = interval_join(clicks, errors, "user_id", max_delay="5 minutes").collect()
    # every pair obeys the range condition
    for r in out:
        dt = (r["l_ts"] - r["r_ts"]).total_seconds()
        assert 0 <= dt <= 300
    # spot: error at t=30s (user 0) matches clicks of user 0 in (30s, 330s]
    got = {
        (r["l_event_id"], r["r_event_id"]) for r in out if r["user_id"] == 0
    }
    assert (5, 1000) in got  # click t=300 vs error t=30 -> dt=270
    assert (10, 1000) not in got  # click t=600 -> dt=570 > 300


def test_stream_stream_join_equals_batch(spark, tmp_path):
    clicks, errors = _streams(spark)
    batch = {
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in interval_join(clicks, errors, "user_id").collect()
    }
    assert len(batch) > 5

    csrc, esrc = str(tmp_path / "clicks"), str(tmp_path / "errors")
    clicks.write.parquet(csrc)
    errors.write.parquet(esrc)
    cs = spark.readStream.schema(SCHEMA).parquet(csrc)
    es = spark.readStream.schema(SCHEMA).parquet(esrc)
    out_dir = str(tmp_path / "out")
    q = (
        interval_join(cs, es, "user_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == batch

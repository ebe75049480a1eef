"""Streaming Sigma correlation (streaming/sigma.py): stream == batch
bucket-for-bucket, incl. a window spanning micro-batches."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sigraph_spark.operators.sigma import apply_correlation
from sigraph_spark.streaming.sigma import stream_correlation

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
FAIL = {"id": "fail", "detection": {"sel": {"event_type": "login_fail"},
                                   "condition": "sel"}}
CORR = {"id": "bf", "type": "event_count", "rules": ["fail"],
        "group-by": ["user_id"], "timespan": "1m",
        "condition": {"gte": 3}}


def _events(spark):
    rows = []
    eid = 0
    for u, offs in ((1, [0, 10, 20, 61, 62, 63, 64]),
                    (2, [5, 15]),
                    (3, [30, 31, 32, 33])):
        for s in offs:
            rows.append((eid, T0 + datetime.timedelta(seconds=s), u,
                         "login_fail", 0.0))
            eid += 1
    rows.append((99, T0 + datetime.timedelta(seconds=7), 1, "other", 0.0))
    # a late closer event far ahead so the watermark passes every window
    rows.append((100, T0 + datetime.timedelta(hours=2), 9,
                 "login_fail", 0.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_stream_equals_batch(spark, tmp_path):
    ev = _events(spark)
    batch = {(r["user_id"], r["window_start"]): r["agg_value"]
             for r in apply_correlation(ev, CORR, {"fail": FAIL}).collect()}
    # expected alerts: user1 bucket0 (3), user1 bucket1 (4), user3 (4)
    assert len(batch) == 3

    src = str(tmp_path / "ev")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double").parquet(src)
    out = str(tmp_path / "alerts")
    q = (
        stream_correlation(stream, CORR, {"fail": FAIL},
                           watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {(r["user_id"], r["window_start"]): r["agg_value"]
           for r in spark.read.parquet(out).collect()}
    # every finalized alert matches the batch bucket exactly
    for k, v in got.items():
        assert batch[k] == v, k
    # all three alert windows are far behind the closer event: emitted
    assert set(got) == set(batch)


def _run_stream(spark, tmp_path, corr, rules, name):
    ev = _events(spark)
    src = str(tmp_path / f"ev_{name}")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double").parquet(src)
    out = str(tmp_path / f"alerts_{name}")
    q = (
        stream_correlation(stream, corr, rules, watermark="1 minute")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return {(r["user_id"], r["window_start"]): r["agg_value"]
            for r in spark.read.parquet(out).collect()}


def test_stream_value_count_equals_batch(spark, tmp_path):
    # r5 ADVICE (medium): count_distinct is rejected in watermarked
    # streaming aggs; the collect_set form must start AND match batch.
    corr = {"id": "vc", "type": "value_count", "field": "event_id",
            "rules": ["fail"], "group-by": ["user_id"],
            "timespan": "1m", "condition": {"gte": 3}}
    got = _run_stream(spark, tmp_path, corr, {"fail": FAIL}, "vc")
    ev = _events(spark)
    batch = {(r["user_id"], r["window_start"]): r["agg_value"]
             for r in apply_correlation(ev, corr, {"fail": FAIL}).collect()}
    assert got == batch and len(batch) == 3


def test_stream_temporal_equals_batch(spark, tmp_path):
    other = {"id": "other", "detection": {"sel": {"event_type": "other"},
                                          "condition": "sel"}}
    corr = {"id": "tm", "type": "temporal",
            "rules": ["fail", "other"], "group-by": ["user_id"],
            "timespan": "1m", "condition": {"gte": 2}}
    rules = {"fail": FAIL, "other": other}
    got = _run_stream(spark, tmp_path, corr, rules, "tm")
    ev = _events(spark)
    batch = {(r["user_id"], r["window_start"]): r["agg_value"]
             for r in apply_correlation(ev, corr, rules).collect()}
    # only user 1's first window has both rules fire
    assert got == batch and len(batch) == 1

"""Streaming media intake (streaming/media.py): stream == batch for
the dedup state, cross-batch near-dup discovery, replay idempotence."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from sigraph_spark.streaming.media import media_batch, stream_media

sys.path.insert(0, "jobs")


def _media(spark, n):
    from run_media_curate import _synthetic_media

    return _synthetic_media(spark, n)


def test_stream_equals_batch_state(spark, tmp_path):
    from sigraph_spark.plans.media import run_media_curation
    from sigraph_spark.plans.media_delta import media_state_tables

    media = _media(spark, 40)
    evens = media.filter(
        F.expr("CAST(substring(media_id, 3) AS INT) % 2 = 0"))
    odds = media.filter(
        F.expr("CAST(substring(media_id, 3) AS INT) % 2 = 1"))
    src = str(tmp_path / "drop")
    os.makedirs(src, exist_ok=True)
    # drop segment files sequentially; each stream run folds the new
    # files as a micro-batch (availableNow + checkpoint offsets)
    evens.write.mode("overwrite").parquet(src)
    wd = str(tmp_path / "mstream")

    q = stream_media(spark, src, wd)
    q.awaitTermination(120)
    odds.write.mode("append").parquet(src)
    q = stream_media(spark, src, wd)
    q.awaitTermination(120)

    stored = media_state_tables(spark, wd)
    got_pairs = {(r["a"], r["b"], r["hamming"], r["plane"])
                 for r in stored["pairs"].collect()}
    batch = run_media_curation(spark, media, str(tmp_path / "mbatch"))
    exp_pairs = {(r["a"], r["b"], r["hamming"], r["plane"])
                 for r in batch["pairs"].collect()}
    assert got_pairs == exp_pairs and len(exp_pairs) > 0


def test_media_batch_replay_noop(spark, tmp_path):
    from sigraph_spark.plans.media_delta import media_state_tables

    wd = str(tmp_path / "mb")
    b0 = _media(spark, 12)
    assert media_batch(b0, 0, wd) is not None
    before = {tuple(r) for r in
              media_state_tables(spark, wd)["index"].collect()}
    assert media_batch(b0, 0, wd) is None  # redelivery
    after = {tuple(r) for r in
             media_state_tables(spark, wd)["index"].collect()}
    assert before == after

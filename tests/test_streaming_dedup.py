"""Streaming exact dedup: the watermarked stream form must keep exactly
one row per content key (same key set as the deterministic batch form),
and the batch form must pick the (min ts, min url) representative."""

from __future__ import annotations

import datetime

from sigraph_spark.streaming.dedup import stream_dedup_exact

SCHEMA = "url string, warc_ts timestamp, text string, lang string"


def _pages(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(90):
        # 30 distinct contents, each crawled 3x under different urls/times
        rows.append(
            (
                f"https://ex.org/{i}",
                base + datetime.timedelta(seconds=11 * i),
                f"page body number {i % 30}",
                "en",
            )
        )
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_dedup_picks_first_seen(spark):
    out = stream_dedup_exact(_pages(spark)).collect()
    assert len(out) == 30
    # representative = earliest crawl of each content (i in 0..29)
    urls = sorted(r["url"] for r in out)
    assert urls == sorted(f"https://ex.org/{i}" for i in range(30))
    assert len({r["content_hash"] for r in out}) == 30


def test_stream_dedup_matches_batch_key_set(spark, tmp_path):
    pages = _pages(spark)
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    batch_keys = {
        r["content_hash"] for r in stream_dedup_exact(pages).collect()
    }

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        stream_dedup_exact(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    got = spark.read.parquet(out_dir).collect()
    assert len(got) == len(batch_keys)  # no duplicate keys emitted
    assert {r["content_hash"] for r in got} == batch_keys

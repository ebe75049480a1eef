"""Watermarked windowed aggregation: stream (availableNow file source)
must produce the same finalized windows as the identical batch grouping,
and the watermark must actually bound/finalize state (append mode emits
closed windows)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from sigraph_spark.streaming.windows import windowed_ingest_stats


def _pages(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(120):
        rows.append(
            (
                f"https://ex.org/{i % 40}",  # repeated urls across windows
                base + datetime.timedelta(seconds=37 * i),
                "word " * (i % 7 + 1),
                "en" if i % 3 else "de",
            )
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )


def test_windowed_stats_stream_equals_batch(spark, tmp_path):
    pages = _pages(spark)
    src = str(tmp_path / "pages")
    pages.write.parquet(src)

    batch_rows = {
        (r["window_start"], r["lang"]): (r["n_pages"], r["text_bytes"], r["approx_urls"])
        for r in windowed_ingest_stats(pages).collect()
    }
    assert len(batch_rows) > 2
    # sanity: totals add up
    assert sum(v[0] for v in batch_rows.values()) == 120

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string, lang string"
    ).parquet(src)
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    q = (
        windowed_ingest_stats(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    got = spark.read.parquet(out_dir)
    stream_rows = {
        (r["window_start"], r["lang"]): (r["n_pages"], r["text_bytes"], r["approx_urls"])
        for r in got.collect()
    }
    # append mode emits only windows the watermark has closed: every
    # emitted window must match batch exactly, and all but the trailing
    # (still-open) windows must have been emitted
    for k, v in stream_rows.items():
        assert batch_rows[k] == v, k
    max_start = max(k[0] for k in batch_rows)
    open_windows = {k for k in batch_rows if k[0] >= max_start - datetime.timedelta(minutes=2)}
    assert set(batch_rows) - set(stream_rows) <= open_windows
    assert len(stream_rows) > 0

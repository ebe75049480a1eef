"""Watermarked windowed aggregations over the page/event stream.

The reference has no windowed analytics (its "streaming" is REST
event-at-a-time — see ``streaming/ingest.py``); these are the standard
Structured-Streaming operators a web-scale ingest deployment layers on
top of the same source: per-window ingest rates, per-language mix, and
late-data-tolerant counters feeding the A13-style summary channel.

Design notes (SURVEY §4 / Structured Streaming):
* the aggregation works UNCHANGED in batch mode — ``F.window`` is a
  plain grouping expression, so batch == stream is a testable property
  (tests/test_streaming_windows.py), not a claim;
* the watermark bounds state: windows older than (max event time seen -
  delay) are finalized and dropped from the state store — required for
  an unbounded stream, a no-op in batch mode;
* output mode "append" emits each window exactly once, AFTER the
  watermark passes its end — the mode every downstream idempotent sink
  wants (a window row never changes after emission).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_ingest_stats(
    pages: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    ts_col: str = "warc_ts",
    stratum_col: str = "lang",
) -> DataFrame:
    """Per-(window, stratum) ingest counters: page count, total text
    bytes, distinct-url approximation (HLL sketch via
    ``approx_count_distinct`` — mergeable, bounded state; exact distinct
    inside a streaming agg would hold every key in state).

    Works on a streaming OR batch DataFrame; the watermark is applied
    only when the input is streaming.
    """
    src = pages
    if pages.isStreaming:
        src = pages.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, slide or window).alias("win"),
            F.col(stratum_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).cast("long").alias("text_bytes"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            stratum_col,
            "n_pages",
            "text_bytes",
            "approx_urls",
        )
    )

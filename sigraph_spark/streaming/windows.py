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


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization: group each key's events into sessions
    that close after ``gap`` of inactivity — ``F.session_window``, the
    Structured-Streaming-native dynamic window (state per OPEN session
    only; the watermark finalizes and drops sessions whose end has
    passed, so state is bounded by concurrent activity, not history).

    Output: (key, session_start, session_end, n_events, total_value)
    with session_end = last event ts + gap (Spark's session semantics:
    windows merge on overlap OR adjacency, so two events exactly
    ``gap`` apart DO merge — pinned in tests).

    Batch == stream by construction (same grouping expression); the
    batch form is hash-oracled against a DuckDB lag/cumulative-sum
    session assignment (gate ``sessionize``), and the streaming form is
    parity-pinned in tests/test_streaming_sessions.py including a
    session that spans micro-batches (proves stateful window merging).
    ``total_value`` sums DECIMAL(18,2) so the oracle is order-exact.

    Beyond-ref streaming family (the reference's ingest is REST
    event-at-a-time, `/root/reference/src/app/backend/api.py`); at
    crawl scale this is the actor-behavior rollup the KG's trace tables
    (A6) consume.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            F.col("total_value").cast("decimal(28,2)").alias("total_value"),
        )
    )

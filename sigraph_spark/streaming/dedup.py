"""Streaming deduplication over the page ingest stream.

The batch dedup family (operators/dedup.py) answers "collapse the corpus
once"; a crawler front-end needs the streaming form: drop re-crawled /
re-delivered page content AS IT ARRIVES, with bounded state.

Operator choice (Structured Streaming):

* ``dropDuplicatesWithinWatermark`` (Spark 3.5+), NOT ``dropDuplicates``:
  plain streaming dropDuplicates holds every key ever seen in the state
  store — unbounded growth on an unbounded crawl. The watermarked form
  evicts keys once the event-time watermark passes them, so state is
  bounded by (watermark horizon x arrival rate) regardless of stream
  lifetime. The trade: a duplicate arriving later than the horizon is
  re-emitted — downstream sinks stay idempotent (the batch-layer exact
  dedup is the backstop, the classic lambda split).
* the dedup key is ``sha2(text)``: content identity, not url — re-crawls
  of the same page under different urls collapse; state per key is the
  32-byte hash + timestamp, not the page.
* batch mode falls back to a DETERMINISTIC first-seen pick (min event
  time, then min url — a total order), so stream and batch agree on the
  kept key set and the batch form is DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stream_dedup_exact(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    url_col: str = "url",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen exact-content dedup; streaming or batch input.

    Output schema: input columns + ``content_hash``. Streaming: one row
    per content key per watermark horizon (arrival order picks the
    representative). Batch: exactly one row per key, the (min ts, min
    url) representative.
    """
    keyed = pages.withColumn(
        "content_hash", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    )
    if keyed.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    w = Window.partitionBy("content_hash").orderBy(ts_col, url_col)
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

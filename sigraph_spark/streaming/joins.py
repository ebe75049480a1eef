"""Watermarked stream-stream joins.

The reference correlates events per-trace by querying the graph store
after ingest; the streaming-native form correlates two live streams
directly — e.g. page-fetch events with rule-match events for the same
unit, or click streams with error streams per user — without landing
either in a table first.

Structured Streaming requirements this encodes (and the test pins):

* BOTH sides carry a watermark, and the join has an EVENT-TIME RANGE
  condition (right.ts in [left.ts - delay, left.ts]) — that pair of
  constraints is what lets the engine compute, per micro-batch, which
  buffered rows can never match again and evict them. An equi-join
  without the range would buffer both streams forever.
* State per side is bounded by (watermark + delay) x arrival rate.
* The operator is the SAME DataFrame expression in batch mode — the
  range condition is a plain join predicate — so stream == batch is a
  testable property and the batch form is SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "5 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join left/right rows sharing ``key`` where the right event
    happened within ``max_delay`` AT OR BEFORE the left event.

    Columns are prefixed (``l_``/``r_``) so the output schema is
    unambiguous; the join key keeps its name.
    """
    l = left.select(
        F.col(key).alias(key),
        *[F.col(c).alias(left_prefix + c) for c in left.columns if c != key],
    )
    r = right.select(
        F.col(key).alias("_rk"),
        *[F.col(c).alias(right_prefix + c) for c in right.columns if c != key],
    )
    if left.isStreaming:
        l = l.withWatermark(left_prefix + left_ts, watermark)
    if right.isStreaming:
        r = r.withWatermark(right_prefix + right_ts, watermark)
    lts, rts = F.col(left_prefix + left_ts), F.col(right_prefix + right_ts)
    cond = (
        (F.col(key) == F.col("_rk"))
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").drop("_rk")

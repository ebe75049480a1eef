"""Temporal KG history: SCD2 compaction of edge observations into
validity intervals, and as-of snapshot reads.

The reference's graph is last-writer-wins only — ``SET r += $rprops``
(src/db/client.py:221) silently overwrites an edge's attributes, so "what
did the graph say about (src, pred, dst) last Tuesday" is unanswerable. At
web scale, recrawls observe the same triple many times with changing
attributes; the standard warehouse answer is a slowly-changing-dimension
(type 2) table: one row per *run* of identical attribute values with
``[valid_from, valid_to)`` bounds (``valid_to`` NULL = current).

Gaps-and-islands, entirely window/agg (no UDF): per key, flag rows whose
value differs (null-safely) from the previous observation, running-sum the
flags into island ids, aggregate each island to its first timestamp, then
``lead`` the island starts into exclusive upper bounds.

100 TB design: every window partitions by the SAME key columns and the
final aggregate groups by them, so the whole operator is ONE hash shuffle
on the key — and zero shuffles when the observation table is already
bucketed by key (the Iceberg layout in plans/iceberg_sql.py). The value
comparison is a struct ``eqNullSafe`` inside codegen. Observation order
must be total: pass ``tiebreak`` columns (e.g. the event/span id) to make
runs deterministic when timestamps collide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compact(
    obs: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Observations -> SCD2 history.

    Output: ``keys + value_cols + (valid_from, valid_to, n_obs)`` — one row
    per maximal run of identical values per key, ordered runs tiled exactly
    (``valid_to`` of run i == ``valid_from`` of run i+1; last run NULL).
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w_obs = Window.partitionBy(*keys).orderBy(*order)
    val = F.struct(*[F.col(c) for c in value_cols])
    changed = F.when(
        F.lag(val).over(w_obs).eqNullSafe(val), F.lit(0)
    ).otherwise(F.lit(1))

    islands = obs.select(
        *keys, ts_col, *value_cols,
        F.sum(changed).over(w_obs).alias("_isl"),
    )
    runs = islands.groupBy(*keys, "_isl").agg(
        F.min(ts_col).alias("valid_from"),
        *[F.first(c).alias(c) for c in value_cols],
        F.count(F.lit(1)).cast("long").alias("n_obs"),
    )
    w_runs = Window.partitionBy(*keys).orderBy("_isl")
    return runs.select(
        *keys, *value_cols,
        "valid_from",
        F.lead("valid_from").over(w_runs).alias("valid_to"),
        "n_obs",
    )


def as_of(history: DataFrame, ts: Column | str) -> DataFrame:
    """Snapshot read of an SCD2 history at timestamp ``ts``: rows whose
    ``[valid_from, valid_to)`` interval covers it. A pure filter — pushes
    down to the scan, prunes time-partitioned history tables."""
    t = F.lit(ts).cast("timestamp") if isinstance(ts, str) else ts
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).drop("valid_to", "n_obs")

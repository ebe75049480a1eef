"""Keyed snapshot diff between two versions of a table.

The reference tracks write-path deltas with summary counters (A13);
auditing a production graph additionally needs the inverse question —
given two materialized snapshots (yesterday's and today's Iceberg
snapshot, a pre- and post-backfill edge table), WHICH rows were added,
removed, or changed. One full-outer join on the merge key answers it.

Scale shape: a single co-partitioned join on the snapshot key (for the
graph tables that key is the bucket column — with bucketed/Iceberg
layout the join is storage-partitioned and shuffle-free, see
sources/tables.write_bucketed_table). Value comparison is null-safe
(``<=>``), so a column going NULL -> value or value -> NULL counts as
changed — and the same predicate is expressible in SQL as
``IS DISTINCT FROM`` (the gate oracle uses exactly that).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diff_tables(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Rows that differ between ``old`` and ``new``, keyed by ``keys``.

    Returns one row per key present in either side with a change:
    ``(*keys, change, old_<c>..., new_<c>...)`` where change ∈
    {'added', 'removed', 'changed'}; unchanged keys are dropped.
    """
    compare = compare or [c for c in new.columns if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, keys, "full_outer")
    any_changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")) for c in compare],
        F.lit(False),
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_changed, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .drop("_in_old", "_in_new")
        .select(*keys, "change", *[f"old_{c}" for c in compare], *[f"new_{c}" for c in compare])
    )


def diff_counts(diff: DataFrame) -> DataFrame:
    """A13-style summary counters over a ``diff_tables`` result."""
    return diff.groupBy("change").agg(F.count("*").alias("n"))

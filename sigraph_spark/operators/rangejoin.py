"""Bucketized range join: point-in-interval matching as an equi-join.

Spark has no range-join optimization: ``points JOIN intervals ON p
BETWEEN lo AND hi`` plans as BroadcastNestedLoopJoin (or a cartesian
product) — O(|points| x |intervals|) comparisons, a non-starter when
both sides are large. The classic fix (used by IP-to-geo, sessionize-
against-windows, genomic overlap workloads) is bucketization:

* choose a bucket width ``w``;
* each point hashes to exactly ONE bucket, ``floor(p / w)``;
* each interval EXPLODES to every bucket it overlaps,
  ``floor(lo/w) .. floor(hi/w)`` — ceil((hi-lo)/w)+1 rows;
* equi-join on the bucket id, then verify ``lo <= p <= hi``.

Because a point lives in exactly one bucket, every matching (point,
interval) pair meets in exactly one bucket — no post-join dedup needed.
Cost: one shuffle on near-uniform bucket ids (skew only if intervals
pile onto one value range — pick ``w`` near the median interval length
so the explode factor stays ~2x). The correctness contract is pinned by
a DuckDB BETWEEN-join oracle (gate ``range_join``) and a
BroadcastNestedLoopJoin-free plan assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 100.0,
) -> DataFrame:
    """Inner join of every point row to every interval row with
    ``lo <= point <= hi``, as bucket-equi-join + residual filter.

    Returns points columns + intervals columns (callers project).
    Intervals with hi < lo are dropped (empty ranges).
    """
    w = float(bucket_width)
    p = points.withColumn("_bk", F.floor(F.col(point_col) / w))
    iv = (
        intervals.filter(F.col(lo_col) <= F.col(hi_col))
        .withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_col) / w).cast("long"),
                    F.floor(F.col(hi_col) / w).cast("long"),
                )
            ),
        )
    )
    return (
        p.join(iv, "_bk")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bk")
    )

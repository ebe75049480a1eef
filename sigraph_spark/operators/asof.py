"""As-of (point-in-time) join — an operator Spark SQL lacks natively.

For each left row, attach the most recent right row whose timestamp is
<= the left timestamp within the same key ("last known value at event
time": price at trade time, last error before a click, feature value at
label time).

Implementation is the UNION-AND-CARRY form, not a range join:

    tag both sides -> union -> ONE shuffle on the key ->
    last(right_payload, ignorenulls) over
        (partition key ORDER BY ts, side, tiebreak ROWS UNBOUNDED
         PRECEDING .. CURRENT) -> keep left rows

Right rows sort BEFORE left rows at equal timestamps, so ts-equality
matches (the <= contract). Cost is one shuffle + one sorted window scan
of |L|+|R| rows per key — at 100 TB this beats the naive
``l JOIN r ON key AND r.ts <= l.ts`` (quadratic per key) and the
exploded range-bucket forms. Skewed keys degrade to a per-key sort, the
same profile as any sessionization; salt the key upstream if one entity
dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_tiebreak: str | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the payload of the most
    recent ``right`` row with ``right_ts <= left_ts`` in the same ``on``
    group (nulls when no such row).

    ``right_tiebreak``: column ordering right rows that share a
    timestamp — the GREATEST value wins (deterministic; required for an
    engine-reproducible result, e.g. a monotonically increasing id).
    Right payload columns come back as ``prefix + name``.
    """
    rpay_cols = [c for c in right.columns if c not in (on, right_ts)]
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.cast("double").alias("_tb"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("_rpay"),
    )
    lcols = left.columns
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(float("inf")).alias("_tb"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.select(
        "_k", "_ts", "_side", "_tb", "_rpay",
        *[F.lit(None).cast(l.schema[f"_l_{c}"].dataType).alias(f"_l_{c}") for c in lcols],
    ).unionByName(l).withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_m.{c}").alias(prefix + c) for c in rpay_cols],
    )
    return out

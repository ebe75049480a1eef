"""Streaming Sigma correlation: meta-rule alerts over event streams.

The detection deployment a SOC actually runs: base Sigma rules
compile to predicates, and the v2 correlation meta-rule aggregates
their matches per group over tumbling ``timespan`` windows — here as
a watermarked Structured Streaming aggregation whose windows are
epoch-aligned (Spark's ``F.window`` origin is 1970-01-01 UTC),
EXACTLY the ``epoch DIV span`` buckets the batch evaluator
(``operators/sigma.apply_correlation``) computes, so stream == batch
holds bucket-for-bucket (pinned in tests, incl. a window spanning
micro-batches).

Late data: the watermark bounds state (windows older than the horizon
finalize and evict); a tumbling alert emitted in append mode is final
— the exactly-once story every other streaming module here uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sigraph_spark.operators.sigma import (
    _corr_condition,
    _timespan_seconds,
    compile_rule,
)

__all__ = ["stream_correlation"]


def stream_correlation(
    events: DataFrame,
    correlation: dict,
    rules: dict,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    field_prefix: str | None = None,
) -> DataFrame:
    """Streaming form of ``apply_correlation`` -> ``(rule_id,
    <group-by...>, window_start, agg_value)`` rows per finalized
    window. Same loud contract for unsupported types/conditions."""
    ctype = correlation.get("type")
    names = correlation.get("rules") or []
    group_by = correlation.get("group-by") or []
    span = _timespan_seconds(correlation.get("timespan", "1h"))
    cond = _corr_condition(correlation.get("condition", {}))
    rid = correlation.get("id", "correlation")
    if ctype not in ("event_count", "value_count", "temporal"):
        raise ValueError(f"unsupported correlation type {ctype!r}")
    if not names:
        raise ValueError("correlation needs base rules")
    missing = [n for n in names if n not in rules]
    if missing:
        raise ValueError(f"unknown base rules: {missing}")
    if ctype == "temporal" and len(names) < 2:
        raise ValueError("temporal correlation needs >= 2 base rules")

    matched = None
    for n in names:
        part = events.filter(
            compile_rule(rules[n], field_prefix=field_prefix)
        ).withColumn("_rule", F.lit(n))
        matched = part if matched is None else matched.unionByName(part)

    win = F.window(F.col(ts_col), f"{span} seconds")
    g = matched.withWatermark(ts_col, watermark).groupBy(
        win.alias("_w"), *group_by)
    # count_distinct is rejected inside watermarked streaming
    # aggregations (AnalysisException on Spark 4.x); size(collect_set)
    # is the streaming-supported equivalent — both ignore NULLs, so the
    # value is identical to the batch twin's count_distinct.
    if ctype == "event_count":
        agg = g.agg(F.count(F.lit(1)).cast("long").alias("agg_value"))
    elif ctype == "value_count":
        fld = correlation.get("field")
        if not fld:
            raise ValueError("value_count needs a field")
        agg = g.agg(F.size(F.collect_set(F.col(fld))).cast("long")
                    .alias("agg_value"))
    else:
        agg = g.agg(F.size(F.collect_set(F.col("_rule"))).cast("long")
                    .alias("agg_value"))
    return agg.filter(cond).select(
        F.lit(rid).alias("rule_id"), *group_by,
        F.col("_w.start").alias("window_start"), "agg_value")

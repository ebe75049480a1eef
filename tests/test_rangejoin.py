"""Bucketized range join: must equal the naive theta join exactly (any
bucket width), and must plan as an equi-join, not a nested-loop."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sigraph_spark.operators.rangejoin import point_in_interval_join


def _fixture(spark):
    points = spark.createDataFrame(
        [(float(p),) for p in [0, 1, 63, 64, 65, 100, 500, 999, 1000, -5]],
        "p double",
    )
    intervals = spark.createDataFrame(
        [
            (0, 0.0, 10.0),
            (1, 63.5, 64.5),     # straddles a bucket boundary
            (2, 50.0, 500.0),    # spans many buckets
            (3, 999.0, 999.0),   # degenerate single-point interval
            (4, 7.0, 3.0),       # empty range -> dropped
            (5, -10.0, -1.0),    # negative range
        ],
        "interval_id long, lo double, hi double",
    )
    return points, intervals


@pytest.mark.parametrize("width", [1.0, 64.0, 1000.0])
def test_bucketized_equals_naive(spark, width):
    points, intervals = _fixture(spark)
    got = {
        (r["p"], r["interval_id"])
        for r in point_in_interval_join(
            points, intervals, "p", bucket_width=width
        ).collect()
    }
    want = {
        (r["p"], r["interval_id"])
        for r in points.join(
            intervals,
            (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
        ).collect()
    }
    assert got == want
    assert (-5.0, 5) in got  # negative buckets handled (floor, not trunc)
    assert (64.0, 1) in got  # boundary-straddling interval found


def test_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _fixture(spark)
    j = point_in_interval_join(points, intervals, "p", bucket_width=64.0)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

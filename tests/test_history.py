from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.history import as_of, scd2_compact


def ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)


@pytest.fixture(scope="module")
def obs(spark):
    rows = [
        # key A: 1,1,2,2,1 -> three runs (1@0, 2@2, 1@4)
        ("A", ts(0), 1, "e0"),
        ("A", ts(1), 1, "e1"),
        ("A", ts(2), 2, "e2"),
        ("A", ts(3), 2, "e3"),
        ("A", ts(4), 1, "e4"),
        # key B: single run, with a NULL value treated as a real state
        ("B", ts(0), None, "e5"),
        ("B", ts(1), None, "e6"),
        ("B", ts(2), 9, "e7"),
    ]
    return spark.createDataFrame(
        rows, "k string, t timestamp, v int, eid string"
    )


def test_runs_tile_exactly(obs):
    h = scd2_compact(obs, ["k"], "t", ["v"], tiebreak=["eid"])
    a = sorted(
        [r.asDict() for r in h.filter("k='A'").collect()],
        key=lambda r: r["valid_from"],
    )
    assert [(r["v"], r["valid_from"], r["valid_to"], r["n_obs"]) for r in a] == [
        (1, ts(0), ts(2), 2),
        (2, ts(2), ts(4), 2),
        (1, ts(4), None, 1),
    ]


def test_null_is_a_state(obs):
    h = scd2_compact(obs, ["k"], "t", ["v"], tiebreak=["eid"])
    b = sorted(
        [r.asDict() for r in h.filter("k='B'").collect()],
        key=lambda r: r["valid_from"],
    )
    assert [(r["v"], r["n_obs"]) for r in b] == [(None, 2), (9, 1)]


def test_as_of_snapshot(obs):
    h = scd2_compact(obs, ["k"], "t", ["v"], tiebreak=["eid"])
    snap = as_of(h, "2024-01-01 03:30:00")
    got = {(r["k"], r["v"]) for r in snap.collect()}
    assert got == {("A", 2), ("B", 9)}
    # before any observation of B's second state
    early = as_of(h, "2024-01-01 00:30:00")
    got = {(r["k"], r["v"]) for r in early.collect()}
    assert got == {("A", 1), ("B", None)}


def test_one_shuffle(obs):
    h = scd2_compact(obs, ["k"], "t", ["v"], tiebreak=["eid"])
    plan = h._jdf.queryExecution().executedPlan().toString()
    # both windows + the groupBy share the key partitioning: exactly one
    # exchange over the observation input
    assert plan.count("Exchange hashpartitioning") == 1, plan

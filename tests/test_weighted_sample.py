"""Derandomized Efraimidis-Spirakis weighted sampling."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sigraph_spark.operators.corpus import weighted_sample


def _u(salt, i):
    d = hashlib.md5(f"{salt}:{i}".encode()).digest()
    return (int.from_bytes(d[:4], "little") + 1.0) / 4294967296.0


def _py_sample(rows, k, salt="ws"):
    keyed = [
        (round(_u(salt, i) ** (1.0 / w), 6), i)
        for i, w in rows
        if w > 0
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return keyed[:k]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w double")


ROWS = [(i, float((i % 7) + 1)) for i in range(200)] + [(900, 0.0), (901, -1.0)]


def test_matches_python_reference(spark):
    got = [
        (r["sample_key"], r["doc_id"])
        for r in weighted_sample(_df(spark, ROWS), "w", 25)
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .collect()
    ]
    assert got == _py_sample(ROWS, 25)


def test_zero_and_negative_weights_excluded(spark):
    ids = {
        r["doc_id"]
        for r in weighted_sample(_df(spark, ROWS), "w", 500).collect()
    }
    assert 900 not in ids and 901 not in ids
    assert len(ids) == 200  # k larger than population -> all positive rows


def test_weight_monotonicity_over_salts():
    """Statistical contract: across many independent salts, a weight-10
    item must be picked much more often than a weight-1 item."""
    rows = [(i, 10.0 if i < 20 else 1.0) for i in range(200)]
    heavy = light = 0
    for s in range(60):
        for _, i in _py_sample(rows, 20, salt=f"s{s}"):
            if i < 20:
                heavy += 1
            else:
                light += 1
    # per-ITEM inclusion rate: each w=10 item must be sampled far more
    # often than each w=1 item (aggregate counts favor the 9x-larger
    # light population, so compare rates, not totals)
    heavy_rate = heavy / (60 * 20)
    light_rate = light / (60 * 180)
    assert heavy_rate > 4 * light_rate


def test_salt_changes_sample_deterministically(spark):
    df = _df(spark, ROWS)
    a = {r["doc_id"] for r in weighted_sample(df, "w", 25, salt="a").collect()}
    b = {r["doc_id"] for r in weighted_sample(df, "w", 25, salt="b").collect()}
    a2 = {r["doc_id"] for r in weighted_sample(df, "w", 25, salt="a").collect()}
    assert a == a2
    assert a != b


def test_partition_invariance(spark):
    df = _df(spark, ROWS)
    a = sorted(weighted_sample(df, "w", 25).collect())
    b = sorted(weighted_sample(df.repartition(7), "w", 25).collect())
    assert a == b

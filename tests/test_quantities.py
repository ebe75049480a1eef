"""Quantity normalization (operators/quantities.py).

Pins the unit inventory with longest-first alternation, exact integer
normalization (decimal digits as integers, BIGINT div), the
non-divisible drop rule (consuming q_idx), cross-unit base equality
(1.5 GB == 1536 MiB? no — decimal vs binary pinned separately), the
TiB range exactness past 2^53, and the zero-UDF / zero-shuffle plan.
"""

from __future__ import annotations

from sigraph_spark.operators.quantities import extract_quantities


def _docs(spark, text: str, url: str = "u1"):
    return spark.createDataFrame([(url, text)], "url string, text string")


def _rows(spark, text: str):
    return {
        (r["q_idx"], r["value_raw"], r["unit"], r["unit_class"], r["base"])
        for r in extract_quantities(_docs(spark, text)).collect()
    }


def test_inventory_and_classes(spark):
    text = "disk 1.5 GB, ram 2 GiB, clock 3.5 GHz, timeout 250 ms"
    assert _rows(spark, text) == {
        (0, "1.5", "GB", "bytes", 1_500_000_000),
        (1, "2", "GiB", "bytes", 2 << 30),
        (2, "3.5", "GHz", "hertz", 3_500_000_000),
        (3, "250", "ms", "micros", 250_000),
    }


def test_equal_bases_across_units(spark):
    # 15 MB == 0.015 GB == 15000 KB: one canonical base
    got = _rows(spark, "a 15 MB b 0.015 GB c 15000 KB")
    assert {r[4] for r in got} == {15_000_000}
    assert len(got) == 3


def test_seven_digit_numbers_out_of_contract(spark):
    # the 6-integer-digit cap is the ANSI overflow guard (7 digits of
    # TiB would exceed BIGINT): a 7-digit number matches only via its
    # 6-digit suffix? no — \b requires a fresh word start, so no match
    assert _rows(spark, "big 1536000 KB") == set()


def test_nondivisible_fraction_drops_but_consumes_idx(spark):
    got = _rows(spark, "bad 0.5 B then good 0.5 KB")
    assert got == {(1, "0.5", "KB", "bytes", 500)}


def test_tib_range_exact_past_double(spark):
    # 999999.875 TiB ~ 1.1e18 bytes: far past 2^53, exact only via the
    # BIGINT div path (875/1000 divides because 125 | 999999875)
    got = _rows(spark, "pool 999999.875 TiB")
    assert got == {
        (0, "999999.875", "TiB", "bytes", 999999875 * (1 << 40) // 1000)
    }
    # and a non-divisible fraction at the same magnitude drops
    assert _rows(spark, "pool 999999.999 TiB") == set()


def test_longest_unit_wins_and_word_boundary(spark):
    got = _rows(spark, "5 min and 10 s but not 7 sec or 9 Hzx")
    assert got == {
        (0, "5", "min", "micros", 300_000_000),
        (1, "10", "s", "micros", 10_000_000),
    }


def test_duration_units(spark):
    got = _rows(spark, "keep 2 d or 3 h or 90 min")
    assert got == {
        (0, "2", "d", "micros", 2 * 86_400_000_000),
        (1, "3", "h", "micros", 3 * 3_600_000_000),
        (2, "90", "min", "micros", 5_400_000_000),
    }


def test_plan_zero_udf_zero_shuffle(spark):
    df = extract_quantities(_docs(spark, "1 KB"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_quantity_columns_on_object_literals(spark):
    from pyspark.sql import functions as F

    from sigraph_spark.operators.quantities import quantity_columns

    df = spark.createDataFrame(
        [("s1", "1.5 GB of storage"), ("s2", "1500 MB"), ("s3", "no size"),
         ("s4", "0.5 B broken")],
        "subject string, object string",
    )
    got = {
        r["subject"]: (r["qty_class"], r["qty_base"])
        for r in quantity_columns(df).collect()
    }
    assert got["s1"] == ("bytes", 1_500_000_000)
    assert got["s2"] == ("bytes", 1_500_000_000)  # cross-unit equality
    assert got["s3"] == (None, None)
    assert got["s4"] == ("bytes", None)  # unit known, base inexact

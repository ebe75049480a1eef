"""Sigma v2 correlation meta-rules (sigma.apply_correlation)."""

from __future__ import annotations

import datetime

import pytest

from sigraph_spark.operators.sigma import apply_correlation

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def _sec(s):
    return T0 + datetime.timedelta(seconds=s)


FAIL = {"id": "fail", "detection": {"sel": {"event_type": "login_fail"},
                                   "condition": "sel"}}
OK = {"id": "ok", "detection": {"sel": {"event_type": "login_ok"},
                                "condition": "sel"}}


def test_event_count_bruteforce(spark):
    rows = [(i, _sec(i * 10), 1, "login_fail", 0.0) for i in range(6)]
    rows += [(100, _sec(5), 2, "login_fail", 0.0)]
    rows += [(101, _sec(70), 1, "other", 0.0)]
    corr = {"id": "bf", "type": "event_count", "rules": ["fail"],
            "group-by": ["user_id"], "timespan": "1m",
            "condition": {"gte": 5}}
    got = apply_correlation(_events(spark, rows), corr, {"fail": FAIL})
    out = got.collect()
    # user 1: bucket [0,60) holds failures at 0..50 = 6 events >= 5
    assert len(out) == 1
    assert (out[0]["user_id"], out[0]["agg_value"]) == (1, 6)
    assert out[0]["rule_id"] == "bf"


def test_value_count_spray(spark):
    # one attacker touching many users: distinct user_id per bucket
    rows = [(i, _sec(i), 100 + i, "login_fail", 0.0) for i in range(4)]
    corr = {"id": "spray", "type": "value_count", "rules": ["fail"],
            "group-by": [], "timespan": "1m", "field": "user_id",
            "condition": {"gte": 4}}
    got = apply_correlation(_events(spark, rows), corr, {"fail": FAIL})
    out = got.collect()
    assert len(out) == 1 and out[0]["agg_value"] == 4


def test_temporal_all_of(spark):
    rows = [(1, _sec(1), 7, "login_fail", 0.0),
            (2, _sec(30), 7, "login_ok", 0.0),   # same bucket: both fire
            (3, _sec(61), 8, "login_fail", 0.0)]  # only one rule
    corr = {"id": "then", "type": "temporal", "rules": ["fail", "ok"],
            "group-by": ["user_id"], "timespan": "1m",
            "condition": {"gte": 2}}
    got = apply_correlation(_events(spark, rows), corr,
                            {"fail": FAIL, "ok": OK})
    out = got.collect()
    assert len(out) == 1 and out[0]["user_id"] == 7


def test_loud_errors(spark):
    ev = _events(spark, [])
    with pytest.raises(ValueError, match="timespan"):
        apply_correlation(ev, {"type": "event_count", "rules": ["fail"],
                               "timespan": "5 minutes",
                               "condition": {"gte": 1}}, {"fail": FAIL})
    with pytest.raises(ValueError, match="unsupported correlation type"):
        apply_correlation(ev, {"type": "nope", "rules": ["fail"],
                               "timespan": "1m",
                               "condition": {"gte": 1}}, {"fail": FAIL})
    with pytest.raises(ValueError, match="unknown base rules"):
        apply_correlation(ev, {"type": "event_count", "rules": ["zzz"],
                               "timespan": "1m",
                               "condition": {"gte": 1}}, {"fail": FAIL})
    with pytest.raises(ValueError, match=">= 2 base rules"):
        apply_correlation(ev, {"type": "temporal", "rules": ["fail"],
                               "timespan": "1m",
                               "condition": {"gte": 1}}, {"fail": FAIL})


def test_negative_epoch_bucket_floor_aligned(spark):
    # r5 ADVICE (low): pre-1970 timestamps must land in the SAME
    # floor-aligned bucket F.window uses, not one bucket above (the
    # truncating-% artifact). 1969-12-31 23:59:30 is epoch -30; with a
    # 1-minute span its floor bucket starts at epoch -60.
    t = datetime.datetime(1969, 12, 31, 23, 59, 30)
    rows = [(i, t + datetime.timedelta(seconds=i), 1, "login_fail", 0.0)
            for i in range(3)]
    corr = {"id": "neg", "type": "event_count", "rules": ["fail"],
            "group-by": ["user_id"], "timespan": "1m",
            "condition": {"gte": 3}}
    out = apply_correlation(_events(spark, rows), corr,
                            {"fail": FAIL}).collect()
    assert len(out) == 1
    assert out[0]["window_start"] == datetime.datetime(1969, 12, 31,
                                                       23, 59, 0)
    assert out[0]["agg_value"] == 3

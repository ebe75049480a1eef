from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.bgp import _order_patterns, match_bgp


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        ("a", "LAUNCH", "b"),
        ("b", "LAUNCH", "c"),
        ("x", "LOAD", "c"),
        ("b", "CONNECT", "ip1"),
        ("b", "CONNECT", "ip2"),
        ("loop", "PING", "loop"),
        ("d", "LAUNCH", "e"),
    ]
    return spark.createDataFrame(rows, "src string, predicate string, dst string")


def test_conjunction(edges):
    out = match_bgp(
        edges,
        [("?p", "LAUNCH", "?c"), ("?q", "LOAD", "?c")],
        where=[F.col("p") != F.col("q")],
    )
    assert sorted(out.columns) == ["c", "p", "q"]
    assert [tuple(r) for r in out.collect()] == [("c", "b", "x")] or out.collect()[
        0
    ].asDict() == {"p": "b", "c": "c", "q": "x"}


def test_chain_three_patterns(edges):
    out = match_bgp(
        edges,
        [("?a", "LAUNCH", "?x"), ("?x", "LAUNCH", "?y"), ("?b", "LOAD", "?y")],
    )
    rows = [r.asDict() for r in out.collect()]
    assert rows == [{"a": "a", "x": "b", "y": "c", "b": "x"}]


def test_optional_null_when_unmatched(edges):
    out = match_bgp(
        edges, [("?p", "LAUNCH", "?c")], optional=[("?c", "CONNECT", "?ip")]
    )
    got = {(r["p"], r["c"], r["ip"]) for r in out.collect()}
    assert ("b", "c", None) in got  # c never connects
    assert ("a", "b", "ip1") in got and ("a", "b", "ip2") in got
    assert ("d", "e", None) in got


def test_optional_requires_shared_variable(edges):
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(edges, [("?p", "LAUNCH", "?c")], optional=[("?z", "LOAD", "?w")])


def test_repeated_variable_in_one_pattern(edges):
    out = match_bgp(edges, [("?x", "PING", "?x")])
    assert [r["x"] for r in out.collect()] == ["loop"]


def test_disconnected_bgp_is_cartesian(edges):
    out = match_bgp(edges, [("?a", "LOAD", "?f"), ("?p", "PING", "?q")])
    assert out.count() == 1  # 1 LOAD x 1 PING
    assert sorted(out.columns) == ["a", "f", "p", "q"]


def test_constant_only_pattern_gates_existence(edges):
    hit = match_bgp(edges, [("?a", "LAUNCH", "?x"), ("x", "LOAD", "c")])
    assert hit.count() == 3  # existence true: all LAUNCH bindings survive
    miss = match_bgp(edges, [("?a", "LAUNCH", "?x"), ("x", "LOAD", "zzz")])
    assert miss.count() == 0


def test_where_accepts_sql_string(edges):
    out = match_bgp(edges, [("?p", "LAUNCH", "?c")], where=["p = 'a'"])
    assert [r["c"] for r in out.collect()] == ["b"]


def test_greedy_order_starts_most_bound():
    pats = [("?a", "?p", "?b"), ("?a", "LAUNCH", "x"), ("?b", "LOAD", "?c")]
    order = _order_patterns(pats)
    assert order[0] == 1  # two constants first
    # then the pattern sharing ?a, then the rest
    assert order == [1, 0, 2]


def test_empty_patterns_rejected(edges):
    with pytest.raises(ValueError):
        match_bgp(edges, [])

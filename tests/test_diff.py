"""Keyed snapshot diff: added/removed/changed classification with
null-safe value comparison (NULL -> value transitions count as changed)."""

from __future__ import annotations

from sigraph_spark.operators.diff import diff_counts, diff_tables


def test_diff_tables_classifies_all_transitions(spark):
    old = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, None), ("c", 3, "z"), ("d", 4, "w")],
        "k string, v int, s string",
    )
    new = spark.createDataFrame(
        [("a", 1, "x"), ("b", 2, "now-set"), ("c", 99, "z"), ("e", 5, "v")],
        "k string, v int, s string",
    )
    out = {r["k"]: r for r in diff_tables(old, new, ["k"]).collect()}
    assert set(out) == {"b", "c", "d", "e"}  # 'a' unchanged -> dropped
    assert out["b"]["change"] == "changed"  # NULL -> value is a change
    assert out["c"]["change"] == "changed" and out["c"]["old_v"] == 3
    assert out["c"]["new_v"] == 99
    assert out["d"]["change"] == "removed" and out["d"]["new_v"] is None
    assert out["e"]["change"] == "added" and out["e"]["old_v"] is None

    counts = {r["change"]: r["n"] for r in diff_counts(
        diff_tables(old, new, ["k"])
    ).collect()}
    assert counts == {"added": 1, "removed": 1, "changed": 2}

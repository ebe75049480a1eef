"""Degree-oriented triangle counting: exact vs brute force, including
the orientation-vs-lexicographic ordering trap."""

from __future__ import annotations

from itertools import combinations

from sigraph_spark.operators.graphalgo import triangle_count, triangle_total


def _brute(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    per = {n: 0 for n in nodes}
    total = 0
    for x, y, z in combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            total += 1
            per[x] += 1
            per[y] += 1
            per[z] += 1
    return total, {n: c for n, c in per.items() if c}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    total, per = _brute(edges)
    assert triangle_total(df) == total
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == per


def test_triangles_clique_plus_tail(spark):
    # K4 (4 triangles, 3 per node) + a pendant edge (no triangles)
    k4 = [(a, b) for a, b in combinations(["a", "b", "c", "d"], 2)]
    _check(spark, k4 + [("d", "e")])


def test_triangles_orientation_vs_lexicographic(spark):
    """Node 'z' (lexicographically last) has the LOWEST degree, so the
    (degree, id) orientation disagrees with string order — the case the
    both-orderings wedge join exists for. Duplicate and reversed edges
    must also collapse."""
    edges = [
        ("z", "a"), ("a", "z"),  # dup reversed
        ("z", "b"),
        ("a", "b"), ("a", "c"), ("a", "d"),  # a: high degree
        ("b", "c"), ("b", "d"),              # b: high degree
        ("c", "d"),
        ("e", "e"),  # self-loop ignored
    ]
    _check(spark, edges)


def test_triangles_bipartite_is_zero(spark):
    bip = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    df = spark.createDataFrame(bip, "src string, dst string")
    assert triangle_total(df) == 0
    assert triangle_count(df).count() == 0

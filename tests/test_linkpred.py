"""Structural link prediction (common-neighbors / Adamic-Adar / Jaccard)."""

from __future__ import annotations

import math
from itertools import combinations

from sigraph_spark.operators.graphalgo import link_prediction

# path + triangle + hub:  a-b, b-c, c-d, a-c (triangle abc), hub h to all
EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
    ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"),
    ("d", "c"),  # duplicate (reversed) of c-d — must dedup
    ("d", "e"),  # leaf e: its pairs have exactly one common neighbor (d)
]


def _py_linkpred(edges, min_cn=1, cap=None):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs: dict[str, set[str]] = {}
    for x, y in und:
        nbrs.setdefault(x, set()).add(y)
        nbrs.setdefault(y, set()).add(x)
    deg = {n: len(s) for n, s in nbrs.items()}
    out = {}
    for u, v in combinations(sorted(nbrs), 2):
        if (u, v) in und:
            continue
        common = nbrs[u] & nbrs[v]
        if cap is not None:
            common = {w for w in common if deg[w] <= cap}
        if len(common) < min_cn:
            continue
        aa = sum(1.0 / math.log(deg[w]) for w in common)
        jac = len(common) / (deg[u] + deg[v] - len(common))
        out[(u, v)] = (len(common), round(aa, 6), round(jac, 6))
    return out


def _df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_matches_python_reference(spark):
    got = {
        (r["u"], r["v"]): (r["cn"], r["adamic_adar"], r["jaccard"])
        for r in link_prediction(_df(spark)).collect()
    }
    expect = _py_linkpred(EDGES)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 1e-6
        assert abs(got[k][2] - expect[k][2]) < 1e-6


def test_existing_edges_excluded(spark):
    out = {(r["u"], r["v"]) for r in link_prediction(_df(spark)).collect()}
    und = {tuple(sorted(e)) for e in EDGES}
    assert not (out & und)


def test_min_cn_threshold(spark):
    base = {
        (r["u"], r["v"]): r["cn"] for r in link_prediction(_df(spark)).collect()
    }
    filt = {
        (r["u"], r["v"]): r["cn"]
        for r in link_prediction(_df(spark), min_cn=2).collect()
    }
    assert filt == {k: v for k, v in base.items() if v >= 2}
    assert len(filt) < len(base)


def test_hub_cap_prunes_hub_wedges(spark):
    """Capping center degree at 3 removes the degree-4 hub h as a wedge
    center: pairs whose only common neighbor is h disappear; AA scores
    of surviving pairs lose exactly h's 1/ln(4) contribution."""
    got = {
        (r["u"], r["v"]): (r["cn"], r["adamic_adar"])
        for r in link_prediction(_df(spark), max_center_degree=3).collect()
    }
    expect = {
        k: (v[0], v[1])
        for k, v in _py_linkpred(EDGES, cap=3).items()
    }
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in expect.items()}
    for k in expect:
        assert abs(got[k][1] - expect[k][1]) < 1e-6


def test_partition_invariance(spark):
    df = _df(spark)
    a = sorted(link_prediction(df).collect())
    b = sorted(link_prediction(df.repartition(7)).collect())
    assert a == b

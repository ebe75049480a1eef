"""Fixed-point PageRank: exact arithmetic, partition invariance, and
bit-identity with the unrolled-CTE SQL restatement."""

from __future__ import annotations

import duckdb

from sigraph_spark.operators.pagerank import SCALE, pagerank, pagerank_oracle_sql

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # d is a source-only node (gets teleport share only)
    ("c", "a"),  # duplicate edge — must collapse
]


def _edges_df(spark, partitions=1):
    return spark.createDataFrame(EDGES, "src string, dst string").repartition(
        partitions
    )


def _expected():
    """Pure-python restatement of the fixed-point recurrence."""
    e = sorted(set(EDGES))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    for _ in range(5):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += rank[u] // deg[u]
        rank = {v: (15 * SCALE) // (100 * n) + (85 * s[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    got = {r["node"]: r["rank_fp"] for r in pagerank(_edges_df(spark)).collect()}
    assert got == _expected()


def test_pagerank_partition_order_invariant(spark):
    """The whole point of fixed-point arithmetic: identical output under
    any partitioning (float sums would drift in the last ulps)."""
    a = sorted(map(tuple, pagerank(_edges_df(spark, 1)).collect()))
    b = sorted(map(tuple, pagerank(_edges_df(spark, 13)).collect()))
    assert a == b


def test_pagerank_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE edges AS SELECT * FROM (VALUES %s) t(src, dst)"
                % ", ".join("('%s','%s')" % p for p in EDGES))
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute("WITH " + pagerank_oracle_sql("edges")).fetchall()
    }
    got = {
        r["node"]: (r["rank_fp"], r["rank"])
        for r in pagerank(_edges_df(spark)).collect()
    }
    assert got == want


def test_pagerank_ranking_is_sane(spark):
    """d has no in-links -> exactly the teleport floor and the minimum;
    the a<->c cycle members dominate b (which splits a's vote with c)."""
    got = {r["node"]: r["rank_fp"] for r in pagerank(_edges_df(spark)).collect()}
    assert got["d"] == min(got.values())
    assert got["d"] == (15 * SCALE) // (100 * 4)
    assert min(got["a"], got["c"]) > got["b"] > got["d"]

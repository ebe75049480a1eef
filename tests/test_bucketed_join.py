"""Bucketed (storage-partitioned) joins: two tables bucketed on the join
key with the same bucket count must join with NO shuffle Exchange on
either side — the property that makes post-build graph queries
shuffle-free at scale."""

from __future__ import annotations

from contextlib import contextmanager

from sigraph_spark.sources.tables import write_bucketed_table


@contextmanager
def _no_broadcast(spark):
    """Force a sort-merge join so the plan assert tests bucketing, not
    broadcast (tiny test tables would otherwise broadcast)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    edges = spark.createDataFrame(
        [(f"n{i % 40}", "calls", f"n{(i * 7) % 40}") for i in range(400)],
        "src string, predicate string, dst string",
    )
    nodes = spark.createDataFrame(
        [(f"n{i}", "PROCESS") for i in range(40)], "node_id string, label string"
    )
    write_bucketed_table(
        edges, "b_edges", ["src"], n_buckets=8, sort_cols=["src"],
        path=str(tmp_path / "edges"),
    )
    write_bucketed_table(
        nodes, "b_nodes", ["node_id"], n_buckets=8, sort_cols=["node_id"],
        path=str(tmp_path / "nodes"),
    )
    with _no_broadcast(spark):
        j = (
            spark.table("b_edges")
            .join(
                spark.table("b_nodes"),
                spark.table("b_edges")["src"] == spark.table("b_nodes")["node_id"],
            )
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # and it still computes the right thing
        assert j.count() == 400


def test_unbucketed_join_does_shuffle(spark, tmp_path):
    """Control: the same join over plain parquet shows the Exchange the
    bucketed layout removes."""
    edges = spark.createDataFrame(
        [(f"n{i % 40}", f"n{(i * 7) % 40}") for i in range(400)],
        "src string, dst string",
    )
    nodes = spark.createDataFrame(
        [(f"n{i}",) for i in range(40)], "node_id string"
    )
    edges.write.parquet(str(tmp_path / "pe"))
    nodes.write.parquet(str(tmp_path / "pn"))
    e = spark.read.parquet(str(tmp_path / "pe"))
    n = spark.read.parquet(str(tmp_path / "pn"))
    with _no_broadcast(spark):
        j = e.join(n, e["src"] == n["node_id"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan

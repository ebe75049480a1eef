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


def test_write_sized_parquet_controls_file_count(spark, tmp_path):
    import glob

    from sigraph_spark.sources.tables import write_sized_parquet

    df = spark.range(0, 20_000, 1, 64).selectExpr(
        "id", "repeat('x', 200) AS payload"
    )
    out = str(tmp_path / "sized")
    # ~20k rows x ~220B json ~ 4.4MB x 0.4 ~ 1.8MB -> 2 files at 1MB target
    n = write_sized_parquet(df, out, target_file_mb=1)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == n
    assert 1 <= n <= 6  # collapsed far below the 64 input partitions
    # and a tiny frame collapses to one file
    n1 = write_sized_parquet(spark.range(5), str(tmp_path / "one"), 512)
    assert n1 == 1
    assert spark.read.parquet(out).count() == 20_000

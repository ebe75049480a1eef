"""Checkpointed stages: manifests, resume-on-match, recompute-on-change,
plus physical-plan hygiene checks (pushdown / no per-row Python)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sigraph_spark.plans.pipeline import (
    read_manifest,
    run_pipeline,
    run_stage,
    table_fingerprint,
)


def test_run_stage_writes_manifest_and_resumes(spark, tmp_path):
    out = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))

    df1 = run_stage(spark, "s", out, build, input_fingerprint="fp-A")
    assert df1.count() == 10
    assert calls["n"] == 1
    m = read_manifest(out)
    assert m["stage"] == "s" and m["rows"] == 10
    assert len(m["partitions"]) >= 1
    # matching fingerprint -> resumed, no recompute
    df2 = run_stage(spark, "s", out, build, input_fingerprint="fp-A")
    assert calls["n"] == 1
    assert df2.count() == 10
    # changed input -> recompute
    run_stage(spark, "s", out, build, input_fingerprint="fp-B")
    assert calls["n"] == 2


def test_table_fingerprint_order_insensitive(spark):
    a = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k"))
    fp1 = table_fingerprint(a.repartition(1))
    fp2 = table_fingerprint(a.repartition(13).sortWithinPartitions(F.col("k")))
    assert fp1 == fp2
    b = spark.range(101).select(F.col("id"), (F.col("id") % 7).alias("k"))
    assert table_fingerprint(b) != fp1


def test_full_pipeline_runs_and_resumes(spark, tmp_path):
    from sigraph_spark.corpus import gen_pages

    pages = gen_pages(spark, sf=0.001)
    wd = str(tmp_path / "wd")
    out1 = run_pipeline(spark, pages, wd, input_fingerprint="run-1")
    n_edges = out1["edges"].count()
    assert n_edges > 0
    assert out1["triples"].count() > 0
    # resume: all manifests match -> same results, instant
    out2 = run_pipeline(spark, pages, wd, input_fingerprint="run-1")
    assert out2["edges"].count() == n_edges
    m = read_manifest(os.path.join(wd, "s4_edges"))
    assert m["input_fingerprint"] == "run-1"


def test_no_python_row_udfs_in_hot_paths(spark):
    """BASELINE.md hot-path constraint: graph construction plans contain no
    BatchEvalPython (row-at-a-time Python); only ArrowEvalPython stages from
    the two sanctioned pandas UDFs may appear anywhere."""
    from sigraph_spark.operators.graph import build_edges, parse_events
    from sigraph_spark.sources.events_map import sigraph_events

    ev = spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    good, _ = parse_events(sigraph_events(ev))
    plan = build_edges(good)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_parquet_column_pruning(spark, tmp_path):
    """A projection over two columns must scan only those columns."""
    p = str(tmp_path / "t.parquet")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("a"), (F.col("id") * 3).alias("b"),
        F.repeat(F.lit("x"), 100).alias("fat"),
    ).write.parquet(p)
    df = spark.read.parquet(p).select("id", "a").filter(F.col("a") > 10)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "fat" not in physical  # pruned
    assert "PushedFilters: [" in physical or "PushedFilters" in physical


def test_crash_mid_stage_recovers(spark, tmp_path):
    """A stale .tmp dir from a killed run must not poison the next run,
    and a missing/mismatched manifest always recomputes."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "stage")
    # simulate a crash: partial tmp dir left behind, no final output
    os.makedirs(out + ".tmp/data", exist_ok=True)
    with open(out + ".tmp/data/garbage", "w") as f:
        f.write("partial write from a killed attempt")

    df = run_stage(
        spark, "s", out,
        lambda: spark.range(7).select(F.col("id")),
        input_fingerprint="fp",
    )
    assert df.count() == 7
    m = read_manifest(out)
    assert m["rows"] == 7
    # a second crash AFTER output exists: tmp dir reappears; resume path
    # must still serve the committed output untouched
    os.makedirs(out + ".tmp", exist_ok=True)
    df2 = run_stage(
        spark, "s", out,
        lambda: (_ for _ in ()).throw(AssertionError("must not recompute")),
        input_fingerprint="fp",
    )
    assert df2.count() == 7

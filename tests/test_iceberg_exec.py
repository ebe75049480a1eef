"""GUARDED Iceberg execution test — the production proof seam.

This container ships no Iceberg runtime jars, so this module SKIPS here
(documented, visible in the pytest summary). In any environment where
``iceberg-spark-runtime`` is on the Spark classpath it executes the exact
DDL + MERGE statements from ``plans/iceberg_sql.py`` against a local
hadoop catalog and asserts row-level parity with the batch combiners in
``operators/graph.py`` — including replay idempotence (every MERGE run
twice). That closes the gap between the parquet-local binding and the
claimed production semantics without faking anything locally.

The execution happens in a SUBPROCESS because Iceberg's session extension
must be configured at SparkSession creation — the shared test fixture's
JVM/session cannot be retrofitted.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_PROBE = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(_PROBE)
        return True
    except Exception:
        return False


_DRIVER_SCRIPT = r"""
import datetime as dt
import sys

from pyspark.sql import SparkSession

warehouse = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)

from sigraph_spark.operators.graph import (
    merge_edges, merge_nodes, merge_trace_spans, merge_traces,
)
from sigraph_spark.plans.iceberg_sql import DB, DDL, MERGE

q = lambda sql: spark.sql(sql.replace(f"{DB}.", f"local.{DB}."))
spark.sql(f"CREATE NAMESPACE IF NOT EXISTS local.{DB}")
for name in ("nodes", "edges", "traces", "trace_spans"):
    q(DDL[name])

ts = dt.datetime(2024, 1, 1, 12, 0, 0)
NSCHEMA = ("node_id string, label string, image string, "
           "related_span_ids array<string>, related_trace_ids array<string>, "
           "image_ts timestamp, image_span string")
n_exist = spark.createDataFrame(
    [("n1", "FILE", "a.exe", ["s1"], ["t1"], ts, "s1"),
     ("n2", "FILE", None, ["s2"], ["t2"], None, None)], NSCHEMA)
n_delta = spark.createDataFrame(
    [("n1", "FILE", "b.exe", ["s3"], ["t1"], ts - dt.timedelta(seconds=1), "s0"),
     ("n2", "FILE", "c.exe", ["s4"], ["t3"], ts, "s4"),
     ("n3", "FILE", None, ["s5"], ["t5"], None, None)], NSCHEMA)

ESCHEMA = ("src string, predicate string, dst string, start_time timestamp, "
           "weight bigint, last_span_id string")
e_exist = spark.createDataFrame(
    [("a", "CREATE", "b", ts, 1, "s1"), ("a", "DELETE", "c", ts, 2, "s2")],
    ESCHEMA)
e_delta = spark.createDataFrame(
    [("a", "CREATE", "b", ts + dt.timedelta(seconds=9), 7, "s9"),
     ("x", "LOAD", "y", ts, 3, "s3")], ESCHEMA)

SSCHEMA = "unit_id string, trace_id string, span_id string"
s_exist = spark.createDataFrame(
    [("u1", "t1", "s1"), ("u1", "t1", "s2")], SSCHEMA)
s_delta = spark.createDataFrame(
    [("u1", "t1", "s2"), ("u1", "t1", "s3"), ("u1", "t9", "s9")], SSCHEMA)

TSCHEMA = ("unit_id string, trace_id string, start_time timestamp, "
           "representative_process_name string, span_count bigint, "
           "rep_span_id string")
t_exist = spark.createDataFrame([("u1", "t1", ts, "p1.exe", 2, "s1")], TSCHEMA)
t_delta = spark.createDataFrame(
    [("u1", "t1", ts - dt.timedelta(seconds=5), "p0.exe", 2, "s0"),
     ("u1", "t9", ts, "p9.exe", 1, "s9")], TSCHEMA)

n_exist.writeTo(f"local.{DB}.nodes").append()
e_exist.writeTo(f"local.{DB}.edges").append()
s_exist.writeTo(f"local.{DB}.trace_spans").append()
t_exist.writeTo(f"local.{DB}.traces").append()

n_delta.createOrReplaceTempView("nodes_delta")
e_delta.createOrReplaceTempView("edges_delta")
s_delta.createOrReplaceTempView("trace_spans_delta")
t_delta.createOrReplaceTempView("traces_delta")

# execute every MERGE TWICE: replay must be a no-op (idempotent combiners)
for _ in range(2):
    for name in ("nodes", "edges", "trace_spans", "traces"):
        q(MERGE[name])

def rows(df):
    return sorted(map(tuple, df.collect()))

expect_nodes = merge_nodes(n_exist, n_delta)
expect_edges = merge_edges(e_exist, e_delta)
expect_spans = merge_trace_spans(s_exist, s_delta)
expect_traces = merge_traces(t_exist, t_delta, expect_spans)

for tbl, exp in [("nodes", expect_nodes), ("edges", expect_edges),
                 ("trace_spans", expect_spans), ("traces", expect_traces)]:
    got = rows(spark.table(f"local.{DB}.{tbl}").select(*exp.columns))
    want = rows(exp)
    assert got == want, f"{tbl}: {got} != {want}"

print("ICEBERG-PARITY-PASS")
"""


def test_iceberg_merge_execution_parity(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath: this is the "
            "environment-bound production proof seam — the statements are "
            "parser-validated + golden-tested in test_iceberg_sql, and "
            "this test executes them wherever the jars exist"
        )
    script = tmp_path / "iceberg_exec.py"
    script.write_text(_DRIVER_SCRIPT)
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "warehouse")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ICEBERG-PARITY-PASS" in proc.stdout

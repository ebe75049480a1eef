"""Skew handling: salted two-phase adjacency == unsalted output; hot-key
detection; determinism across partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.graph import adjacency_lists
from sigraph_spark.operators.skew import hot_keys, salted_adjacency, top_degree_entities


def _edges(spark, n=2000, hot_share=3):
    """Synthetic edge table where src 'hot' carries ~1/hot_share of rows."""
    base = spark.range(n)
    src = F.when(F.col("id") % hot_share == 0, F.lit("hot")).otherwise(
        F.concat(F.lit("n"), (F.col("id") % 50).cast("string"))
    )
    return base.select(
        src.alias("src"),
        F.lit("CONNECT").alias("predicate"),
        F.concat(F.lit("d"), (F.col("id") % 97).cast("string")).alias("dst"),
        F.to_timestamp(F.lit("2024-01-01")).alias("start_time"),
        (F.col("id") % 5 + 1).cast("long").alias("weight"),
    )


def test_hot_keys_detects_head(spark):
    e = _edges(spark)
    hot = {r["src"] for r in hot_keys(e, "src", threshold_rows=300).collect()}
    assert hot == {"hot"}


def test_salted_matches_unsalted(spark):
    e = _edges(spark)
    plain = {
        r["src"]: (r["out_degree"], tuple(map(tuple, r["out_edges"])))
        for r in adjacency_lists(e).collect()
    }
    salted = {
        r["src"]: (r["out_degree"], tuple(map(tuple, r["out_edges"])))
        for r in salted_adjacency(e, threshold_rows=300, salt_buckets=8).collect()
    }
    assert plain == salted


def test_salted_deterministic_across_partitionings(spark):
    e = _edges(spark)
    a = {r["src"]: tuple(map(tuple, r["out_edges"]))
         for r in salted_adjacency(e.repartition(3), threshold_rows=300).collect()}
    b = {r["src"]: tuple(map(tuple, r["out_edges"]))
         for r in salted_adjacency(e.repartition(17), threshold_rows=300).collect()}
    assert a == b


def test_top_degree_entities(spark):
    e = _edges(spark)
    top = top_degree_entities(e, n=1).collect()
    assert top[0]["entity"] == "hot"

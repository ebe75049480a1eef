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


def test_choose_salting_decision(spark):
    """Skewed input -> hot key detected, buckets sized to the head; uniform
    input -> no salting (buckets=1). The decision dict is manifest-ready."""
    from pyspark.sql import functions as F

    from sigraph_spark.operators.skew import choose_salting

    # 10_000 rows on one hot src, 100 cold srcs with 10 rows each
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("src"), F.col("id").cast("string").alias("dst")
    )
    cold = spark.range(1_000).select(
        F.concat(F.lit("c"), (F.col("id") % 100).cast("string")).alias("src"),
        F.col("id").cast("string").alias("dst"),
    )
    d = choose_salting(hot.unionAll(cold), nominal_parallelism=8, floor_rows=256)
    assert d["max_src_degree"] == 10_000
    assert d["top_degrees"][0]["key"] == "HOT"
    assert d["hot_key_count"] == 1
    assert 2 <= d["salt_buckets"] <= 64
    # buckets spread the head to ~target-size groups
    assert 10_000 / d["salt_buckets"] <= 2 * d["target_rows_per_reducer"]

    u = choose_salting(cold, nominal_parallelism=8, floor_rows=256)
    assert u["salt_buckets"] == 1 and u["hot_key_count"] == 0

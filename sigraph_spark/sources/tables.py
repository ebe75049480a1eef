"""Source/sink helpers: testdata tables + warehouse DDL.

The driver's TPC-H-ish parquet tables live at
``/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`` (TESTDATA.md). In
production the same loaders bind to Iceberg catalogs (``spark.table``);
locally they are parquet reads — the query layer is agnostic.

Column pruning / predicate pushdown discipline: every loader returns the
raw scan; callers select only what they need so ``ReadSchema`` in the
physical plan stays minimal (verified in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write a bucketed (hash-partitioned-by-key) table — the local analog
    of Iceberg's ``bucket(N, col)`` storage partitioning.

    Why it matters at 100 TB: a join between two tables bucketed on the
    join key with the same bucket count reads co-located buckets and runs
    with NO Exchange on either side (verified by plan assert in
    tests/test_bucketed_join.py). For the graph tables that means every
    adjacency expansion / node-attribute join after the initial build is
    shuffle-free — the big one-time shuffle happens at write time, then
    every downstream query reuses it. ``sort_cols`` additionally pre-sorts
    within buckets so sort-merge joins skip their sort.

    ``path`` makes it an external table (data at ``path``, metadata in the
    session catalog) — pass it in tests to keep data out of the cwd
    warehouse dir.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def write_atomic_parquet(df: DataFrame, out_dir: str, partition_by: list[str] | None = None) -> None:
    """Overwrite-atomically: write tmp, rename into place (the local-mode
    stand-in for an Iceberg commit)."""
    import shutil

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)

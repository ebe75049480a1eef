"""Z-order layout: interleave correctness vs an independent Python
reference, exact bucket arithmetic, and the property that justifies the
operator at scale — a Z-ordered layout bounds EVERY keyed column's
range per partition, where a single-column sort bounds only its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.layout import (
    cluster_by_zorder,
    int_bucket,
    zorder_key,
    zorder_oracle_sql,
)


def _py_interleave(vals, bits):
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 3, 4096)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key([F.col("a"), F.col("b")], 16).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_interleave([a, b], 16)


def test_bucket_bounds_and_clamp(spark):
    df = spark.createDataFrame([(v,) for v in (-5, 0, 50, 100, 999)], "v long")
    out = [
        r["b"]
        for r in df.select(int_bucket(F.col("v"), 0, 100, 8).alias("b"))
        .orderBy("v")
        .collect()
    ]
    assert out[0] == 0                    # clamped below
    assert out[-1] == (100 * 256) // 101  # clamped above -> vmax bucket
    assert all(0 <= b <= 255 for b in out)
    assert out == sorted(out)   # monotone


def test_zorder_oracle_sql_is_same_arithmetic():
    sql = zorder_oracle_sql(["x", "y"], 4)
    import duckdb

    con = duckdb.connect()
    for x in range(16):
        for y in range(16):
            got = con.execute(
                f"SELECT {sql} FROM (SELECT {x}::BIGINT x, {y}::BIGINT y)"
            ).fetchone()[0]
            assert got == _py_interleave([x, y], 4)


def test_guards():
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2)], bits=32)  # 64 bits > 62
    with pytest.raises(ValueError):
        int_bucket(F.lit(1), 10, 5)
    with pytest.raises(ValueError):
        int_bucket(F.lit(1), 0, 1 << 40, bits=16)  # precision loss


def test_zorder_layout_bounds_both_key_ranges(spark):
    # synthetic events: user x time grid, shuffled
    n_users, n_ts = 64, 64
    df = (
        spark.range(n_users * n_ts)
        .select(
            (F.col("id") % n_users).alias("user"),
            (F.col("id") / n_users).cast("long").alias("t"),
        )
        .repartition(8)  # destroy any incidental order
    )
    ub = int_bucket(F.col("user"), 0, n_users - 1, 6)
    tb = int_bucket(F.col("t"), 0, n_ts - 1, 6)
    parts = 16

    def parts_touched_per(laid_out, col):
        """Avg number of partitions whose [min, max] range on ``col``
        contains a given value — what min/max pruning must scan for an
        equality predicate on that column."""
        spans = (
            laid_out.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        assert len(spans) == parts
        touched = [
            sum(1 for r in spans if r["lo"] <= v <= r["hi"])
            for v in range(64)
        ]
        return sum(touched) / len(touched)

    z = cluster_by_zorder(df, [ub, tb], parts, bits=6)
    t_sorted = df.repartitionByRange(parts, F.col("t")).sortWithinPartitions("t")
    # t-sorted layout: a user-equality scan touches EVERY partition;
    # z-ordered: user ranges are bounded per partition (~4 of 16), at a
    # bounded cost on the t dimension (still prunable, not all-parts)
    assert parts_touched_per(t_sorted, "user") == parts
    assert parts_touched_per(z, "user") <= parts / 2
    assert parts_touched_per(z, "t") <= parts / 2


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_adjacent(spark):
    from sigraph_spark.operators.layout import with_hilbert_key

    bits, n = 5, 32
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in with_hilbert_key(df, "x", "y", bits).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _xy2d(n, x, y)
    # the property Z-order lacks: consecutive keys are ADJACENT cells
    # (Manhattan distance exactly 1), so a range query reads one
    # contiguous fragment per rectangle side instead of scattered runs
    inv = {d: xy for xy, d in got.items()}
    assert len(inv) == n * n  # bijection
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_plan_stays_linear(spark):
    """16-bit keys = 16 chained projections; if CollapseProject ever
    inlined them the expression tree would be ~3^16 nodes and this
    would hang/explode rather than run in milliseconds."""
    from sigraph_spark.operators.layout import with_hilbert_key

    df = spark.range(1000).select(
        (F.col("id") % 999).alias("x"), (F.col("id") % 997).alias("y")
    )
    out = with_hilbert_key(df, "x", "y", bits=16)
    assert out.count() == 1000
    # narrow map: no exchange in the plan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_hilbert_guard():
    import pytest as _pytest

    from sigraph_spark.operators.layout import with_hilbert_key

    with _pytest.raises(ValueError):
        with_hilbert_key(None, "x", "y", bits=32)


def test_compaction_plan_semantics(spark):
    """First-fit prefix-sum planning: jobs fill to ~target, large
    files keep, single-file groups demote to keep, and the whole
    plan matches the DuckDB oracle restatement."""
    import duckdb

    from sigraph_spark.operators.layout import (
        compaction_oracle_sql,
        plan_compaction,
    )

    rows = [(f"f-{i:03d}", 100 + (i * 37) % 900) for i in range(50)]
    rows += [("big-1", 5000), ("big-2", 9000), ("tiny-lone", 1999)]
    df = spark.createDataFrame(rows, "path string, bytes long")
    got = sorted(
        (r["path"], r["bytes"], r["job"], r["action"])
        for r in plan_compaction(df, 2000).collect()
    )
    cte = "SELECT * FROM (VALUES " + ",".join(
        f"('{p}', {b})" for p, b in rows
    ) + ") AS t(path, bytes)"
    want = sorted(
        tuple(r)
        for r in duckdb.sql(compaction_oracle_sql(cte, 2000)).fetchall()
    )
    assert got == want
    # large files always keep with NULL job
    by_path = {p: (j, a) for p, _, j, a in got}
    assert by_path["big-1"] == (None, "keep")
    # prefix binning guarantees: every group's input < 2x target, and
    # the group count is near-optimal (<= ceil(total_small / target))
    sums = {}
    total_small = 0
    for p, b, j, a in got:
        if b < 2000:
            total_small += b
        if j is not None:
            sums[j] = sums.get(j, 0) + b
    assert sums
    assert all(s < 2 * 2000 for s in sums.values())
    assert len(sums) <= -(-total_small // 2000)
    with pytest.raises(ValueError):
        plan_compaction(df, 0)


def test_compact_parquet_rewrites_small_files(spark, tmp_path):
    from sigraph_spark.operators.layout import compact_parquet

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    df.repartition(40).write.parquet(src)
    report = compact_parquet(spark, src, dst, target_bytes=200_000)
    assert report["n_input"] == 40
    assert report["n_jobs"] >= 1
    back = spark.read.option("recursiveFileLookup", "true").parquet(dst)
    assert back.count() == 20000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20000))
    import os

    nfiles = sum(
        1 for _, _, fs in os.walk(dst)
        for f in fs if f.endswith(".parquet")
    )
    # exactly one data file per rewrite job + the kept copies
    assert nfiles == report["n_jobs"] + report["n_kept"]
    assert nfiles < 40

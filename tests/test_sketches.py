"""Portable HLL sketch: python-reference parity, semilattice merge,
estimator branches, partition invariance."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sigraph_spark.operators.sketches import (
    hll_distinct, hll_estimate, hll_merge, hll_python_reference,
    hll_registers,
)


def _values_df(spark, n, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.lit("k").alias("k"),
        F.concat(F.lit("val-"), F.col("id")).alias("v"),
    )


def _py_registers(values, p):
    w = 32 - p
    regs: dict[int, int] = {}
    for s in values:
        h = int.from_bytes(
            hashlib.md5(str(s).encode("utf-8")).digest()[:4], "little"
        )
        idx, v = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if v == 0 else w + 1 - v.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_registers_match_python_reference(spark):
    df = _values_df(spark, 500)
    got = {
        r["reg"]: r["rho"]
        for r in hll_registers(df, ["k"], "v", p=10).collect()
    }
    assert got == _py_registers([f"val-{i}" for i in range(500)], 10)


def test_estimate_matches_python_reference_both_branches(spark):
    # small range -> linear counting; dense sketch at p=4 -> raw branch
    for n, p in ((500, 12), (5000, 4)):
        df = _values_df(spark, n)
        [row] = hll_distinct(df, ["k"], "v", p=p).collect()
        ref = hll_python_reference([f"val-{i}" for i in range(n)], p=p)
        assert row["estimate"] == ref
        # accuracy sanity: within 10% at p=12, 40% at p=4 (16 registers)
        tol = 0.1 if p == 12 else 0.4
        assert abs(row["estimate"] - n) / n < tol


def test_raw_branch_engaged_when_no_zero_registers(spark):
    # p=4 with 5000 distinct values fills all 16 registers -> raw path
    regs = hll_registers(_values_df(spark, 5000), ["k"], "v", p=4)
    assert regs.count() == 16


def test_merge_is_exactly_union_sketch(spark):
    df = _values_df(spark, 2000)
    a = df.filter(F.col("id") < 1500)  # overlap tests idempotence
    b = df.filter(F.col("id") >= 1000)
    merged = hll_merge(
        hll_registers(a, ["k"], "v"), hll_registers(b, ["k"], "v"), ["k"]
    )
    full = hll_registers(df, ["k"], "v")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_partition_invariance(spark):
    est1 = hll_distinct(_values_df(spark, 3000, parts=1), ["k"], "v").collect()
    est8 = hll_distinct(_values_df(spark, 3000, parts=8), ["k"], "v").collect()
    assert est1 == est8


def test_multi_key_sketch(spark):
    df = spark.range(0, 900).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 300).cast("string").alias("v"),
    )
    out = {r["k"]: r["estimate"] for r in hll_distinct(df, ["k"], "v").collect()}
    assert set(out) == {"0", "1", "2"}
    for k in out:
        ref = hll_python_reference(
            sorted({str(i % 300) for i in range(900) if i % 3 == int(k)})
        )
        assert out[k] == ref


def test_p_bounds(spark):
    with pytest.raises(ValueError):
        hll_registers(_values_df(spark, 10), ["k"], "v", p=3)


# --- Count-Min sketch --------------------------------------------------------


def _cms_python(values, w, d, weights=None):
    cells: dict = {}
    for i, v in enumerate(values):
        wt = 1 if weights is None else weights[i]
        for j in range(d):
            h = int.from_bytes(
                hashlib.md5(f"{j}|{v}".encode()).digest()[:4], "little"
            ) % w
            cells[(j, h)] = cells.get((j, h), 0) + wt
    return cells


def _cms_est_python(cells, key, w, d):
    return min(
        cells.get(
            (j, int.from_bytes(
                hashlib.md5(f"{j}|{key}".encode()).digest()[:4], "little"
            ) % w),
            0,
        )
        for j in range(d)
    )


def test_cms_cells_match_python_reference(spark):
    from sigraph_spark.operators.sketches import cms_sketch

    vals = [f"k{i % 7}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    got = {(r["j"], r["cell"]): r["total"]
           for r in cms_sketch(df, "key", w=32, d=3).collect()}
    assert got == _cms_python(vals, 32, 3)


def test_cms_estimate_overestimates_never_undercounts(spark):
    from sigraph_spark.operators.sketches import cms_estimate, cms_sketch

    # heavy skew + narrow width -> collisions guaranteed
    vals = ["hot"] * 500 + [f"cold{i}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    cms = cms_sketch(df, "key", w=16, d=3)
    est = {r["key"]: r["est"]
           for r in cms_estimate(cms, df, "key", w=16, d=3).collect()}
    import collections
    true = collections.Counter(vals)
    cells = _cms_python(vals, 16, 3)
    for k, t in true.items():
        assert est[k] >= t
        assert est[k] == _cms_est_python(cells, k, 16, 3)
    # the hot key dominates every cell it touches -> exact for it
    assert est["hot"] == 500 or est["hot"] > 500


def test_cms_exact_when_wide(spark):
    from sigraph_spark.operators.sketches import cms_estimate, cms_sketch

    vals = [f"k{i % 5}" for i in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "key string")
    cms = cms_sketch(df, "key", w=65536, d=4)
    est = {r["key"]: r["est"]
           for r in cms_estimate(cms, df, "key", w=65536, d=4).collect()}
    assert est == {f"k{i}": 20 for i in range(5)}


def test_cms_merge_equals_union_sketch(spark):
    from sigraph_spark.operators.sketches import cms_merge, cms_sketch

    from pyspark.sql import functions as F

    df = spark.range(0, 300).select(
        F.concat(F.lit("k"), (F.col("id") % 9)).alias("key"), "id"
    )
    a = df.filter(F.col("id") % 5 < 2).drop("id")
    b = df.filter(F.col("id") % 5 >= 2).drop("id")
    df = df.drop("id")
    sa, sb = cms_sketch(a, "key", w=32, d=2), cms_sketch(b, "key", w=32, d=2)
    merged = {(r["j"], r["cell"]): r["total"]
              for r in cms_merge(sa, sb).collect()}
    full = {(r["j"], r["cell"]): r["total"]
            for r in cms_sketch(df, "key", w=32, d=2).collect()}
    assert merged == full


def test_cms_weighted_and_partition_invariant(spark):
    from pyspark.sql import functions as F
    from sigraph_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.range(0, 500).select(
        F.concat(F.lit("k"), (F.col("id") % 11)).alias("key"),
        (F.col("id") % 3 + 1).alias("w"),
    )
    outs = []
    for parts in (1, 8):
        cms = cms_sketch(df.repartition(parts), "key", w=4096, d=3,
                         weight_col="w")
        outs.append(sorted(map(tuple, cms_estimate(
            cms, df.select("key"), "key", w=4096, d=3).collect())))
    assert outs[0] == outs[1]
    # exact at this width: compare against the true weighted sums
    import collections
    true = collections.Counter()
    for i in range(500):
        true[f"k{i % 11}"] += i % 3 + 1
    assert dict(outs[0]) == dict(true)


def test_cms_depth_bound(spark):
    import pytest as _pytest
    from sigraph_spark.operators.sketches import cms_sketch

    df = spark.createDataFrame([("a",)], "key string")
    with _pytest.raises(ValueError):
        cms_sketch(df, "key", d=9)

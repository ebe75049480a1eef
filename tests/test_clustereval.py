"""Clustering-eval metrics vs hand-computed values (Bagga & Baldwin
B-cubed; pairwise pair-counting), plus the no-pairs NULL guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from sigraph_spark.operators.clustereval import bcubed, pairwise_metrics

# classic example: items 1-5; pred groups {1,2,3},{4,5};
# gold groups {1,2},{3,4},{5}
ASSIGN = [
    (1, "p1", "g1"), (2, "p1", "g1"), (3, "p1", "g2"),
    (4, "p2", "g2"), (5, "p2", "g3"),
]


def _df(spark, rows=ASSIGN):
    return spark.createDataFrame(
        rows, "item long, pred_cluster string, gold_cluster string"
    )


def test_bcubed_hand_computed(spark):
    r = bcubed(_df(spark)).collect()[0]
    # per-item precision: 1:2/3 2:2/3 3:1/3 4:1/2 5:1/2 -> avg 41/60? no:
    # (2/3 + 2/3 + 1/3 + 1/2 + 1/2) / 5 = (20/30+20/30+10/30+15/30+15/30)/5
    # = (80/30)/5 = 8/15
    assert abs(r["bcubed_precision"] - 8 / 15) < 1e-12
    # per-item recall: 1:2/2 2:2/2 3:1/2 4:1/2 5:1/1 -> (1+1+.5+.5+1)/5 = 0.8
    assert abs(r["bcubed_recall"] - 0.8) < 1e-12
    p, q = 8 / 15, 0.8
    assert abs(r["bcubed_f1"] - 2 * p * q / (p + q)) < 1e-12
    assert r["n_items"] == 5


def test_pairwise_hand_computed(spark):
    r = pairwise_metrics(_df(spark)).collect()[0]
    # pred pairs: C(3,2)+C(2,2)=3+1=4; gold pairs: 1+1+0=2
    # tp pairs (same pred AND same gold): {1,2} only -> 1
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (1, 4, 2)
    assert abs(r["pair_precision"] - 0.25) < 1e-12
    assert abs(r["pair_recall"] - 0.5) < 1e-12
    assert abs(r["pair_f1"] - (2 * 0.25 * 0.5 / 0.75)) < 1e-12


def test_perfect_clustering_is_all_ones(spark):
    rows = [(i, f"c{i % 3}", f"c{i % 3}") for i in range(12)]
    b = bcubed(_df(spark, rows)).collect()[0]
    p = pairwise_metrics(_df(spark, rows)).collect()[0]
    assert b["bcubed_precision"] == b["bcubed_recall"] == b["bcubed_f1"] == 1.0
    assert p["pair_precision"] == p["pair_recall"] == p["pair_f1"] == 1.0


def test_no_pairs_yields_null_not_divide_by_zero(spark):
    # all singletons on both sides: zero pairs everywhere; ANSI mode
    # must not raise, the ratio metrics must be NULL
    rows = [(i, f"p{i}", f"g{i}") for i in range(4)]
    r = pairwise_metrics(_df(spark, rows)).collect()[0]
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (0, 0, 0)
    assert r["pair_precision"] is None
    assert r["pair_recall"] is None
    assert r["pair_f1"] is None
    b = bcubed(_df(spark, rows)).collect()[0]
    # B-cubed of all-singletons is trivially perfect (each item alone)
    assert b["bcubed_precision"] == b["bcubed_recall"] == 1.0


def test_null_cluster_id_raises_loudly(spark):
    # a NULL assignment would silently drop out of the equi-joins on
    # cluster id (NULL never equals NULL) — must raise instead
    import pytest

    rows = [(1, "p1", "g1"), (2, None, "g1"), (3, "p1", "g2")]
    df = spark.createDataFrame(
        rows, "item long, pred_cluster string, gold_cluster string"
    )
    with pytest.raises(Exception, match="NULL pred_cluster"):
        bcubed(df).collect()
    rows2 = [(1, "p1", "g1"), (2, "p2", None)]
    df2 = spark.createDataFrame(
        rows2, "item long, pred_cluster string, gold_cluster string"
    )
    with pytest.raises(Exception, match="NULL gold_cluster"):
        pairwise_metrics(df2).collect()


def test_pair_sum_exact_beyond_float53(spark):
    # the n-choose-2 aggregate must stay in BIGINT: for c = 2e9,
    # c*(c-1)/2 is not representable in float64 (> 2^53) — the shifted
    # integer path is exact, the '/'-then-cast path would round
    from sigraph_spark.operators.clustereval import _pairs_sum

    c = 1_234_567_891
    df = spark.createDataFrame([(c,)], "sz long")
    got = df.agg(_pairs_sum("sz").alias("p")).collect()[0]["p"]
    exact = c * (c - 1) // 2
    assert got == exact
    # prove the float path would have been wrong for this input
    assert int(float(c * (c - 1)) / 2) != exact

"""Similarity search: brute-force cosine top-k + LSH-bucketed ANN."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sigraph_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    topk_recall,
)


def _vectors(spark, n=64, dim=8):
    # deterministic vectors: cluster c = id % 4 sets the dominant axis
    rows = []
    for i in range(n):
        c = i % 4
        v = [0.1 * ((i * 7 + d) % 5) for d in range(dim)]
        v[c] += 3.0
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_self_is_rank1(spark):
    vecs = _vectors(spark)
    q = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(vecs, q, k=5)
    r1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    assert r1 == {0: 0, 1: 1, 2: 2}
    # all cosines within [-1, 1+eps]
    for r in out.collect():
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9


def test_brute_force_matches_numpy(spark):
    vecs = _vectors(spark, n=16)
    rows = {r["vec_id"]: r["embedding"] for r in vecs.collect()}
    q = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(vecs, q, k=16).collect()

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return sum(x * y for x, y in zip(a, b)) / (da * db)

    for r in out:
        expected = cos(rows[0], rows[r["vec_id"]])
        assert abs(r["cosine"] - expected) < 1e-6


def test_lsh_topk_recall(spark):
    vecs = _vectors(spark, n=128)
    q = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(vecs, q, k=5)
    approx = lsh_topk(vecs, q, dim=8, k=5, bits=2)
    rec = topk_recall(exact, approx).agg(F.avg("recall")).collect()[0][0]
    # clustered data + coarse buckets: same-cluster vectors share buckets
    assert rec >= 0.5
    # the query itself always lands in its own bucket
    self_hits = {r["query_id"]: r["vec_id"] for r in approx.filter(F.col("rank") == 1).collect()}
    assert self_hits == {0: 0, 1: 1, 2: 2, 3: 3}


def test_lsh_buckets_deterministic(spark):
    vecs = _vectors(spark, n=32)
    q = vecs.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    a = sorted(map(tuple, lsh_topk(vecs, q, dim=8, k=3, bits=4).collect()))
    b = sorted(map(tuple, lsh_topk(vecs.repartition(5), q, dim=8, k=3, bits=4).collect()))
    assert a == b


def test_salted_topk_no_single_partition_window(spark):
    """topk_per_query: results identical to a naive global window, and the
    physical plan windows on (query_id, _salt) first — no stage funnels the
    whole scored relation into one partition per query (ADVICE r1)."""
    from pyspark.sql import Window

    from sigraph_spark.operators.similarity import topk_per_query

    vecs = _vectors(spark, n=200)
    q = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(vecs, q, k=7)
    # naive reference ranking
    from sigraph_spark.operators.similarity import dot, l2_normalize

    c = vecs.select("vec_id", l2_normalize(F.col("embedding")).alias("cv"))
    qq = q.select("query_id", l2_normalize(F.col("embedding")).alias("qv"))
    scored = c.crossJoin(qq).select(
        "query_id", "vec_id", dot(F.col("cv"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    naive = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 7
    )
    a = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in out.collect())
    b = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in naive.collect())
    assert a == b
    plan = topk_per_query(scored, 7)._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # sharded first stage present


def test_embedding_neardup_lsh_recall(spark):
    """Planted near-duplicates: the banded LSH path must recover >= 0.9 of
    the brute-force pairs (VERDICT r1 next-8) and report exact cosines."""
    import random

    from sigraph_spark.operators.dedup import embedding_neardup
    from sigraph_spark.operators.similarity import embedding_neardup_lsh

    rng = random.Random(11)
    dim = 16
    rows = []
    vid = 0
    for base in range(40):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((vid, v)); vid += 1
        if base % 2 == 0:  # plant a near-duplicate (tiny perturbation)
            w = [x + rng.uniform(-0.01, 0.01) for x in v]
            rows.append((vid, w)); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["a"], r["b"]) for r in embedding_neardup(emb, threshold=0.99).collect()}
    got_rows = embedding_neardup_lsh(emb, dim=dim, threshold=0.99, bits=6, bands=6).collect()
    got = {(r["a"], r["b"]) for r in got_rows}
    assert len(exact) >= 20
    assert got <= exact  # exact-verify: no false positives
    assert len(got & exact) / len(exact) >= 0.9
    # pair dedup: first-matching-band filter leaves each pair once
    assert len(got_rows) == len(got)


def test_ivf_topk_recall(spark):
    from sigraph_spark.operators.similarity import ivf_index, ivf_topk

    vecs = _vectors(spark, n=128)
    q = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tagged, centroids = ivf_index(vecs, k=4)
    assert len(centroids) == 4 and len(centroids[0]) == 8
    exact = brute_force_topk(vecs, q, k=5)
    approx = ivf_topk(tagged, centroids, q, k=5, n_probe=2)
    rec = topk_recall(exact, approx).agg(F.avg("recall")).collect()[0][0]
    # 4 natural clusters, 4 centroids, 2 probes: high recall expected
    assert rec >= 0.8, rec
    self_hits = {r["query_id"]: r["vec_id"]
                 for r in approx.filter(F.col("rank") == 1).collect()}
    assert self_hits == {0: 0, 1: 1, 2: 2, 3: 3}


def test_ivf_assign_nearest_centroid(spark):
    """ivf_assign picks the argmax-dot centroid; first index wins ties."""
    from pyspark.sql import functions as F

    from sigraph_spark.operators.similarity import ivf_assign

    cents = [[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]  # 1 and 2 identical
    df = spark.createDataFrame(
        [(0, [2.0, 0.1]), (1, [0.1, 3.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["cluster"] for r in ivf_assign(df, cents).collect()}
    assert out[0] == 0
    assert out[1] == 1  # tie between centroids 1 and 2 -> first index
    assert out[2] == 0  # zero vector: all scores 0 -> first centroid


def test_lsh_numpy_kernel_matches_column_buckets(spark):
    """The matmul bucket kernel (scale path) produces the same bucket ids
    as the unrolled Column form on real embeddings — sign decisions agree
    (dots are never at the float boundary on real data)."""
    from pyspark.sql import functions as F

    from sigraph_spark.operators.similarity import (
        l2_normalize, lsh_bucket, lsh_buckets_udf,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    col_form = e.select(
        "vec_id",
        F.array(*[
            lsh_bucket(l2_normalize(F.col("embedding")), 64, 4, plane_offset=b * 4)
            for b in range(8)
        ]).alias("bks"),
    )
    np_form = e.select(
        "vec_id", lsh_buckets_udf(64, 4, 8)(F.col("embedding")).alias("bks")
    )
    a = {r["vec_id"]: list(r["bks"]) for r in col_form.collect()}
    b = {r["vec_id"]: list(r["bks"]) for r in np_form.collect()}
    assert a == b


def test_embedding_centroids_exact_means(spark):
    from sigraph_spark.operators.similarity import embedding_centroids

    rows = [
        (0, [1.0, 2.0, 3.0]), (0, [3.0, 2.0, 1.0]),
        (1, [0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "label int, embedding array<double>"
    )
    got = {r["label"]: (r["n_vectors"], r["centroid"])
           for r in embedding_centroids(emb).collect()}
    assert got[0] == (2, [2.0, 2.0, 2.0])
    assert got[1] == (1, [0.0, 0.0, 0.0])

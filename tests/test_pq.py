"""Product quantization (operators/pq.py) — trainer parity vs a pure-
Python fixed-point reference, encode/ADC contracts, and recall against
brute force on clusterable data."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sigraph_spark.operators.pq import pq_encode, pq_topk, pq_train_lloyd

M, D, K = 4, 4, 4  # 16-dim vectors, 4 sub-spaces of 4 dims, 4 codewords
SCALE = 1 << 24


def _vectors(n=64, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    # clustered data: codewords have something real to find
    centers = rng.normal(0, 1.0, size=(K, dim))
    out = []
    for i in range(n):
        c = centers[i % K]
        out.append((i, [float(x) for x in
                        (c + rng.normal(0, 0.05, dim)).astype(np.float32)]))
    return out


def _py_train(rows, m=M, k=K, iters=2):
    """Independent reference of the fixed-point Lloyd contract."""
    d = len(rows[0][1]) // m
    rows = sorted(rows)
    books = [[[rows[j][1][mi * d + t] for t in range(d)] for j in range(k)]
             for mi in range(m)]

    def sqd(a, b):
        da = sum(x * x for x in a)
        db = sum(x * x for x in b)
        ab = sum(x * y for x, y in zip(a, b))
        return da - 2 * ab + db

    for _ in range(iters):
        sums = {}
        for _vid, v in rows:
            for mi in range(m):
                sub = v[mi * d:(mi + 1) * d]
                dists = [sqd(sub, c) for c in books[mi]]
                cj = dists.index(min(dists))
                s, n = sums.setdefault((mi, cj),
                                       ([0] * d, [0]))
                for t in range(d):
                    s[t] += math.floor(sub[t] * SCALE)
                n[0] += 1
        for (mi, cj), (s, n) in sums.items():
            books[mi][cj] = [x / (SCALE * n[0]) for x in s]
    return books


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _vectors(), "vec_id long, embedding array<double>")


def test_trainer_matches_reference(spark, emb):
    got = pq_train_lloyd(emb, m=M, k=K, iters=2)
    exp = _py_train(_vectors())
    for mi in range(M):
        for j in range(K):
            assert got[mi][j] == pytest.approx(exp[mi][j], abs=1e-12), (mi, j)


def test_encode_shape_and_determinism(spark, emb):
    books = pq_train_lloyd(emb, m=M, k=K, iters=2)
    codes = {r["vec_id"]: r["codes"]
             for r in pq_encode(emb, books).collect()}
    assert len(codes) == 64
    assert all(len(c) == M and all(0 <= x < K for x in c)
               for c in codes.values())
    # clustered fixture: members of one true cluster share their code
    for i in range(4, 64):
        assert codes[i] == codes[i % K], i


def test_adc_topk_recall_vs_bruteforce(spark, emb):
    books = pq_train_lloyd(emb, m=M, k=K, iters=2)
    queries = emb.filter("vec_id < 3").withColumnRenamed(
        "vec_id", "query_id")
    got = pq_topk(pq_encode(emb, books), books, queries, k=10)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    data = dict(_vectors())
    for qid, rs in by_q.items():
        assert len(rs) == 10
        # every ADC hit must be a true same-cluster member: exact
        # squared L2 to the query below the cross-cluster floor
        for r in rs:
            ex = sum((a - b) ** 2
                     for a, b in zip(data[qid], data[r["vec_id"]]))
            assert ex < 1.0, (qid, r["vec_id"], ex)
        # ranks are 1..10, adist non-decreasing
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, 11))
        assert all(rs[i]["adist"] <= rs[i + 1]["adist"]
                   for i in range(9))


def test_ivfpq_end_to_end(spark, emb):
    from sigraph_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    cents, books = ivfpq_train(emb, k_coarse=K, m=M, k_pq=K, iters=2)
    enc = ivfpq_encode(emb, cents, books)
    rows = enc.collect()
    assert len(rows) == 64
    # clustered fixture: one coarse cluster per true center, and
    # same-cluster members share residual codes
    by_id = {r["vec_id"]: r for r in rows}
    for i in range(4, 64):
        assert by_id[i]["cluster"] == by_id[i % K]["cluster"], i

    queries = emb.filter("vec_id < 3").withColumnRenamed(
        "vec_id", "query_id")
    got = ivfpq_topk(enc, cents, books, queries, k=10, n_probe=1)
    data = dict(_vectors())
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 10
        # with 1 probe, every hit lives in the query's own cluster
        for r in rs:
            assert r["vec_id"] % K == qid % K, (qid, r["vec_id"])
        rs = sorted(rs, key=lambda r: r["rank"])
        assert all(rs[i]["adist"] <= rs[i + 1]["adist"] for i in range(9))


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame([(0, [0.0] * 10)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_lloyd(df, m=4, k=1, iters=1)
